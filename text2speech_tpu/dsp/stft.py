"""STFT / ISTFT as MXU matmuls — the TPU-native replacement for both of the
reference's spectral paths.

The reference computes spectra two ways that are numerically identical up to
framing: offline ``librosa.stft`` (``utils/audio.py:153-157``) and online
conv1d against a windowed Fourier basis (``utils/stft.py:46-99``).  Here there
is one implementation: frames are extracted with a strided gather and hit the
MXU as a single ``[n_frames, n_fft] @ [n_fft, 2*cutoff]`` matmul against the
windowed real-DFT basis — large, batched, static-shape, exactly what XLA tiles
best.  Reflect padding matches librosa ``center=True`` / ``utils/stft.py:79-83``.

All functions are jittable and batched over the leading axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .filters import (
    fourier_basis,
    inverse_fourier_basis,
    window_sumsquare,
)


class STFTParams(NamedTuple):
    filter_length: int
    hop_length: int
    win_length: int

    @property
    def cutoff(self) -> int:
        return self.filter_length // 2 + 1


@functools.lru_cache(maxsize=8)
def _forward_basis(filter_length: int, win_length: int) -> np.ndarray:
    # [n_fft, 2*cutoff], ready for frames @ basis
    return fourier_basis(filter_length, win_length).T.copy()


@functools.lru_cache(maxsize=8)
def _inverse_basis(filter_length: int, win_length: int, hop_length: int) -> np.ndarray:
    return inverse_fourier_basis(filter_length, win_length, hop_length)


def frame_signal(
    y: jnp.ndarray, n_fft: int, hop: int, center: bool = True
) -> jnp.ndarray:
    """Reflect-pad by n_fft//2 (when ``center``) and slice into overlapping
    frames.  Pass ``center=False`` for signals already padded host-side (the
    batched-preprocess path, where per-utterance reflect edges must come from
    each signal's own samples, not batch zero-padding).

    y: [B, T] -> [B, 1 + T//hop, n_fft] (center) or [B, 1 + (T-n_fft)//hop, n_fft]
    """
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return y[:, idx]


def stft_real_imag(
    y: jnp.ndarray, params: STFTParams, dtype=jnp.float32, center: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed STFT via one MXU matmul.

    y: [B, T] -> (real, imag) each [B, cutoff, n_frames].
    """
    basis = jnp.asarray(
        _forward_basis(params.filter_length, params.win_length), dtype=dtype
    )
    frames = frame_signal(
        y.astype(dtype), params.filter_length, params.hop_length, center
    )
    spec = jnp.einsum(
        "btn,nk->bkt", frames, basis, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    cutoff = params.cutoff
    return spec[:, :cutoff, :], spec[:, cutoff:, :]


def stft_magnitude(
    y: jnp.ndarray, params: STFTParams, dtype=jnp.float32, center: bool = True
) -> jnp.ndarray:
    """|STFT(y)|: [B, T] -> [B, cutoff, n_frames]."""
    re, im = stft_real_imag(y, params, dtype, center)
    return jnp.sqrt(re * re + im * im)


def stft_mag_phase(
    y: jnp.ndarray, params: STFTParams
) -> tuple[jnp.ndarray, jnp.ndarray]:
    re, im = stft_real_imag(y, params)
    return jnp.sqrt(re * re + im * im), jnp.arctan2(im, re)


def istft(
    magnitude: jnp.ndarray, phase: jnp.ndarray, params: STFTParams
) -> jnp.ndarray:
    """Inverse STFT via transposed-conv overlap-add with window-sumsquare
    correction (reference ``utils/stft.py:101-130``).

    magnitude/phase: [B, cutoff, n_frames] -> [B, T] with
    T = hop * (n_frames - 1) (center padding removed).
    """
    n_frames = magnitude.shape[-1]
    n_fft, hop = params.filter_length, params.hop_length
    re_im = jnp.concatenate(
        [magnitude * jnp.cos(phase), magnitude * jnp.sin(phase)], axis=1
    )  # [B, 2*cutoff, n_frames]
    inv_basis = jnp.asarray(
        _inverse_basis(n_fft, params.win_length, hop)
    )  # [2*cutoff, n_fft]

    # Overlap-add: y[i*hop : i*hop+n_fft] += inv_basis.T @ re_im[:, :, i]
    frames = jnp.einsum(
        "bkt,kn->btn", re_im, inv_basis, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )  # [B, n_frames, n_fft]
    total = n_fft + hop * (n_frames - 1)

    if n_fft % hop == 0:
        # Vectorized overlap-add: split each frame into r=n_fft/hop hop-sized
        # chunks; chunk j of frame i lands in output block i+j.  r shifted adds
        # replace a sequential scan — fully parallel on the VPU.
        r = n_fft // hop
        B = frames.shape[0]
        chunks = frames.reshape(B, n_frames, r, hop)
        signal = jnp.zeros((B, n_frames + r - 1, hop), dtype=frames.dtype)
        for j in range(r):
            signal = signal.at[:, j : j + n_frames].add(chunks[:, :, j])
        signal = signal.reshape(B, total)
    else:

        def overlap_add(sig, frame_i):
            frame, i = frame_i
            return (
                jax.lax.dynamic_update_slice(
                    sig,
                    jax.lax.dynamic_slice(sig, (i * hop,), (n_fft,)) + frame,
                    (i * hop,),
                ),
                None,
            )

        def one_batch(frames_b):
            sig0 = jnp.zeros((total,), dtype=frames_b.dtype)
            sig, _ = jax.lax.scan(
                overlap_add, sig0, (frames_b, jnp.arange(n_frames))
            )
            return sig

        signal = jax.vmap(one_batch)(frames)

    wss = window_sumsquare(n_frames, hop, params.win_length, n_fft)
    tiny = np.finfo(np.float32).tiny
    correction = np.where(wss > tiny, 1.0 / np.maximum(wss, tiny), 1.0)
    signal = signal * jnp.asarray(correction)[None, :]
    signal = signal * (float(n_fft) / hop)
    return signal[:, n_fft // 2 : -(n_fft // 2)]


def num_frames(n_samples: int, hop_length: int) -> int:
    """Frame count for a centered STFT (librosa center=True convention)."""
    return 1 + n_samples // hop_length
