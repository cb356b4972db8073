"""Online mel frontend — the training-time convention.

Rebuilds ``TacotronSTFT`` (``/root/reference/utils/layers.py:42-79``): mel =
log(clamp(mel_basis @ |STFT(y)|, 1e-5)) with fmin=0/fmax=8000, the convention
the Tacotron data loader (``utils/data_utils.py:77-88``) and WaveGlow's
Mel2Samp (``waveglow/mel2samp.py:78-84``) both feed the models with.  Distinct
from the offline dB chain in :mod:`.audio` (the reference keeps both; so do we).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .filters import mel_filterbank
from .stft import STFTParams, stft_magnitude


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0, clip_val: float = 1e-5):
    """log(clamp(x) * C) (``utils/audio_processing.py:70-77``)."""
    return jnp.log(jnp.maximum(x, clip_val) * C)


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0):
    return jnp.exp(x) / C


@functools.lru_cache(maxsize=8)
def _mel_basis(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    return mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)


@dataclass(frozen=True)
class MelFrontend:
    """Jittable waveform->log-mel transform (TacotronSTFT equivalent)."""

    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    sampling_rate: int = 22050
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0

    @property
    def stft_params(self) -> STFTParams:
        return STFTParams(self.filter_length, self.hop_length, self.win_length)

    def mel_spectrogram(self, y: jnp.ndarray, center: bool = True) -> jnp.ndarray:
        """[B, T] in [-1, 1] -> [B, n_mels, n_frames] log-mel.

        ``center=False`` expects the caller to have reflect-padded each
        signal by ``filter_length // 2`` host-side (the batched-extraction
        path: per-utterance reflect edges must come from each signal's own
        samples, not batch zero-padding)."""
        mag = stft_magnitude(y, self.stft_params, center=center)
        basis = jnp.asarray(
            _mel_basis(
                self.sampling_rate,
                self.filter_length,
                self.n_mel_channels,
                self.mel_fmin,
                self.mel_fmax,
            )
        )
        mel = jnp.einsum(
            "mf,bft->bmt", basis, mag, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
        return dynamic_range_compression(mel)

    @classmethod
    def from_hparams(cls, hp) -> "MelFrontend":
        return cls(
            filter_length=hp.filter_length,
            hop_length=hp.hop_length,
            win_length=hp.win_length,
            n_mel_channels=hp.n_mel_channels,
            sampling_rate=hp.sample_rate,
            mel_fmin=hp.mel_fmin,
            mel_fmax=hp.mel_fmax,
        )
