"""Offline audio DSP chain (preprocess-side), jittable JAX + host IO.

Rebuilds the numpy/librosa/scipy chain of ``/root/reference/utils/audio.py``
as batched, static-shape JAX ops so corpus preprocessing runs on TPU:
pre-emphasis, amp<->dB, spectrogram normalize/denormalize, mel & linear
spectrograms (offline convention: ``_amp_to_db(.) - ref_level_db``,
``utils/audio.py:69-84``), the mu-law family (``:277-374``), silence trimming
(librosa.effects.trim semantics, ``:51-58``), and Griffin-Lim (``:140-150``).

Host-side wav IO uses scipy (librosa is not available offline); resampling is
polyphase (``resample_poly``) rather than librosa's kaiser-windowed sinc, the
one knowingly inexact substitution (<1e-3 waveform L1; SURVEY.md §7.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HParams
from .filters import mel_filterbank
from .stft import STFTParams, istft, stft_mag_phase, stft_magnitude

# ---------------------------------------------------------------------------
# host-side wav IO
# ---------------------------------------------------------------------------


def load_wav(path: str, sr: int) -> np.ndarray:
    """Load a wav as float32 in [-1, 1] at sample rate ``sr``
    (librosa.core.load equivalent, ``utils/audio.py:10-11``).

    Fast path: the native C++ decoder+resampler (:mod:`..native`), which
    matches scipy bit-for-bit on taps it is handed; falls back to
    scipy.io/scipy.signal when the native lib is unavailable."""
    from ..native import load_wav_native

    y = load_wav_native(path, sr)
    if y is not None:
        return y

    from scipy.io import wavfile
    from scipy.signal import resample_poly

    file_sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        y = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        y = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        y = (data.astype(np.float32) - 128.0) / 128.0
    else:
        y = data.astype(np.float32)
    if y.ndim == 2:  # downmix like librosa (mean over channels)
        y = y.mean(axis=1)
    if file_sr != sr:
        g = np.gcd(int(sr), int(file_sr))
        y = resample_poly(y, sr // g, file_sr // g).astype(np.float32)
    return y


def save_wav(wav: np.ndarray, path: str, sr: int) -> None:
    """PCM16 write with peak scaling (``utils/audio.py:14-17``)."""
    from scipy.io import wavfile

    wav = np.asarray(wav, dtype=np.float32)
    wav = wav * (32767 / max(0.01, float(np.max(np.abs(wav)))))
    wavfile.write(path, sr, wav.astype(np.int16))


# ---------------------------------------------------------------------------
# elementwise chains (jittable)
# ---------------------------------------------------------------------------


def preemphasis(y: jnp.ndarray, k: float, enabled: bool = True) -> jnp.ndarray:
    """FIR pre-emphasis y[t] - k*y[t-1] (scipy lfilter([1,-k],[1]) equivalent)."""
    if not enabled:
        return y
    prev = jnp.concatenate([jnp.zeros_like(y[..., :1]), y[..., :-1]], axis=-1)
    return y - k * prev


def inv_preemphasis(y: jnp.ndarray, k: float, enabled: bool = True) -> jnp.ndarray:
    """IIR de-emphasis y[t] = x[t] + k*y[t-1] as a scan."""
    if not enabled:
        return y

    def step(carry, x):
        out = x + k * carry
        return out, out

    moved = jnp.moveaxis(y, -1, 0)
    _, out = jax.lax.scan(step, jnp.zeros(moved.shape[1:], moved.dtype), moved)
    return jnp.moveaxis(out, 0, -1)


def amp_to_db(x: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    min_level = np.exp(min_level_db / 20 * np.log(10))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize_spec(S: jnp.ndarray, hp: HParams) -> jnp.ndarray:
    """dB spectrogram -> normalized range (``utils/audio.py:233-248``)."""
    mad = hp.max_abs_value
    mld = hp.min_level_db
    if hp.symmetric_mels:
        out = (2 * mad) * ((S - mld) / (-mld)) - mad
        lo, hi = -mad, mad
    else:
        out = mad * ((S - mld) / (-mld))
        lo, hi = 0.0, mad
    if hp.allow_clipping_in_normalization:
        out = jnp.clip(out, lo, hi)
    return out


def denormalize_spec(D: jnp.ndarray, hp: HParams) -> jnp.ndarray:
    mad = hp.max_abs_value
    mld = hp.min_level_db
    if hp.allow_clipping_in_normalization:
        D = jnp.clip(D, -mad if hp.symmetric_mels else 0.0, mad)
    if hp.symmetric_mels:
        return ((D + mad) * -mld / (2 * mad)) + mld
    return (D * -mld / mad) + mld


# ---------------------------------------------------------------------------
# mu-law family (utils/audio.py:277-374)
# ---------------------------------------------------------------------------


def mulaw(x: jnp.ndarray, mu: float = 256) -> jnp.ndarray:
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)


def inv_mulaw(y: jnp.ndarray, mu: float = 256) -> jnp.ndarray:
    return jnp.sign(y) * (1.0 / mu) * ((1.0 + mu) ** jnp.abs(y) - 1.0)


def mulaw_quantize(x: jnp.ndarray, mu: int = 256) -> jnp.ndarray:
    mu = mu - 1
    y = mulaw(x, mu)
    return ((y + 1) / 2 * mu).astype(jnp.int32)  # truncation == reference astype(int)


def inv_mulaw_quantize(y: jnp.ndarray, mu: int = 256) -> jnp.ndarray:
    mu = mu - 1
    return inv_mulaw(2.0 * y.astype(jnp.float32) / mu - 1.0, mu)


def start_and_end_indices(quantized: np.ndarray, silence_threshold: int = 2):
    """First/last sample whose mu-law code deviates from mid-scale
    (``utils/audio.py:37-48``). Host-side (variable-length output)."""
    nonsilent = np.abs(quantized - 127) > silence_threshold
    idx = np.flatnonzero(nonsilent)
    start = int(idx[0]) if idx.size else 0
    end = int(idx[-1]) if idx.size else len(quantized) - 1
    return start, end


# ---------------------------------------------------------------------------
# silence trim (librosa.effects.trim semantics)
# ---------------------------------------------------------------------------


def _frame_rms_db(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    pad = frame_length // 2
    yp = np.pad(y, pad, mode="constant")
    n_frames = 1 + (len(yp) - frame_length) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    frames = yp[idx]
    mse = np.mean(frames.astype(np.float64) ** 2, axis=1)
    amin = 1e-10
    ref = max(mse.max(), amin)
    return 10.0 * np.log10(np.maximum(amin, mse)) - 10.0 * np.log10(ref)


def trim_silence_bounds(
    y: np.ndarray, top_db: float, frame_length: int, hop_length: int
) -> tuple[int, int]:
    """[start, end) sample bounds of the non-silent span, matching
    ``librosa.effects.trim`` as called at ``utils/audio.py:51-58``."""
    db = _frame_rms_db(y, frame_length, hop_length)
    nonsilent = np.flatnonzero(db > -top_db)
    if nonsilent.size == 0:
        return 0, 0
    start = int(nonsilent[0]) * hop_length
    end = min(len(y), int(nonsilent[-1] + 1) * hop_length)
    return start, end


def trim_silence(y: np.ndarray, hp: HParams) -> np.ndarray:
    s, e = trim_silence_bounds(y, hp.trim_top_db, hp.trim_fft_size, hp.trim_hop_size)
    return y[s:e]


def trim_bounds_batch(
    y: jnp.ndarray,          # [B, T] zero-padded batch
    lengths: jnp.ndarray,    # [B] true sample counts
    top_db: float,
    frame_length: int,
    hop_length: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched on-device ``librosa.effects.trim`` bounds: [start, end) sample
    indices of each row's non-silent span (``utils/audio.py:51-58``
    semantics, jittable — the device replacement for the host loop in
    :func:`trim_silence_bounds`).

    Rows are zero-padded; all-zero tail frames are silent by construction
    (their dB falls to the floor), so the per-row result matches the
    host implementation on the true-length signal."""
    pad = frame_length // 2
    yp = jnp.pad(y.astype(jnp.float32), ((0, 0), (pad, pad)))
    sq = yp[..., None] ** 2                                 # [B, T', 1]
    k = jnp.full((frame_length, 1, 1), 1.0 / frame_length, jnp.float32)
    mse = jax.lax.conv_general_dilated(
        sq, k, window_strides=(hop_length,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[..., 0]                                               # [B, n_frames]
    amin = 1e-10
    ref = jnp.maximum(jnp.max(mse, axis=1, keepdims=True), amin)
    db = 10.0 * jnp.log10(jnp.maximum(mse, amin)) - 10.0 * jnp.log10(ref)
    nonsilent = db > -top_db
    any_ns = nonsilent.any(axis=1)
    n = nonsilent.shape[1]
    first = jnp.argmax(nonsilent, axis=1)
    last = n - 1 - jnp.argmax(nonsilent[:, ::-1], axis=1)
    start = jnp.where(any_ns, first * hop_length, 0)
    end = jnp.where(
        any_ns, jnp.minimum(lengths, (last + 1) * hop_length), 0
    )
    return start.astype(jnp.int32), end.astype(jnp.int32)


# ---------------------------------------------------------------------------
# spectrograms — offline convention (amp_to_db - ref_level_db)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _offline_mel_basis(sample_rate: int, n_fft: int, n_mels: int) -> np.ndarray:
    # Offline chain uses fmin=0, fmax=sr/2 (utils/audio.py:220-221).
    return mel_filterbank(sample_rate, n_fft, n_mels)


def _stft_params(hp: HParams) -> STFTParams:
    return STFTParams(hp.filter_length, hp.hop_length, hp.win_length)


def linear_spectrogram(y: jnp.ndarray, hp: HParams) -> jnp.ndarray:
    """[B, T] -> [B, n_freq, n_frames] linear-dB spectrogram
    (``utils/audio.py:69-75``)."""
    D = stft_magnitude(
        preemphasis(y, hp.preemphasis, hp.preemphasize), _stft_params(hp)
    )
    S = amp_to_db(D, hp.min_level_db) - hp.ref_level_db
    if hp.signal_normalization:
        return normalize_spec(S, hp)
    return S


def mel_spectrogram(y: jnp.ndarray, hp: HParams) -> jnp.ndarray:
    """[B, T] -> [B, n_mels, n_frames] mel-dB spectrogram
    (``utils/audio.py:78-84``)."""
    D = stft_magnitude(
        preemphasis(y, hp.preemphasis, hp.preemphasize), _stft_params(hp)
    )
    basis = jnp.asarray(
        _offline_mel_basis(hp.sample_rate, hp.filter_length, hp.n_mel_channels)
    )
    S = amp_to_db(
        jnp.einsum("mf,bft->bmt", basis, D, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST),
        hp.min_level_db,
    ) - hp.ref_level_db
    if hp.signal_normalization:
        return normalize_spec(S, hp)
    return S


def mel_and_linear_spectrogram(
    y: jnp.ndarray, hp: HParams, center: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One STFT, both spectrograms — the fused form of the preprocess hot loop
    (``datasets/kss.py:102-110`` runs the STFT twice; we don't).

    ``center=False`` expects host-side reflect-padded input (batched
    preprocessing; see :mod:`..data.preprocess`)."""
    D = stft_magnitude(
        preemphasis(y, hp.preemphasis, hp.preemphasize), _stft_params(hp),
        center=center,
    )
    linear = amp_to_db(D, hp.min_level_db) - hp.ref_level_db
    basis = jnp.asarray(
        _offline_mel_basis(hp.sample_rate, hp.filter_length, hp.n_mel_channels)
    )
    mel = amp_to_db(
        jnp.einsum("mf,bft->bmt", basis, D, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST),
        hp.min_level_db,
    ) - hp.ref_level_db
    if hp.signal_normalization:
        return normalize_spec(mel, hp), normalize_spec(linear, hp)
    return mel, linear


# ---------------------------------------------------------------------------
# Griffin-Lim inversion
# ---------------------------------------------------------------------------


def griffin_lim(
    S: jnp.ndarray,
    hp: HParams,
    key: jax.Array,
    n_iters: int | None = None,
) -> jnp.ndarray:
    """Magnitude spectrogram [B, n_freq, n_frames] -> waveform [B, T]
    (``utils/audio.py:140-150``): random phase init, iterate
    ISTFT -> STFT -> keep phase."""
    params = _stft_params(hp)
    n_iters = hp.griffin_lim_iters if n_iters is None else n_iters
    phase = (
        2.0 * jnp.pi * jax.random.uniform(key, S.shape, dtype=jnp.float32)
    )
    y = istft(S, phase, params)

    def body(_, y):
        _, ang = stft_mag_phase(y, params)
        return istft(S, ang, params)

    return jax.lax.fori_loop(0, n_iters, body, y)


def inv_linear_spectrogram(
    linear: jnp.ndarray, hp: HParams, key: jax.Array
) -> jnp.ndarray:
    """dB linear spectrogram -> waveform (``utils/audio.py:87-102``)."""
    D = denormalize_spec(linear, hp) if hp.signal_normalization else linear
    S = db_to_amp(D + hp.ref_level_db)
    y = griffin_lim(S ** hp.power, hp, key)
    return inv_preemphasis(y, hp.preemphasis, hp.preemphasize)


def inv_mel_spectrogram(
    mel: jnp.ndarray, hp: HParams, key: jax.Array
) -> jnp.ndarray:
    """dB mel spectrogram -> waveform via pinv(mel_basis) + Griffin-Lim
    (``utils/audio.py:105-120, 207-211``)."""
    D = denormalize_spec(mel, hp) if hp.signal_normalization else mel
    amp = db_to_amp(D + hp.ref_level_db)
    basis = _offline_mel_basis(hp.sample_rate, hp.filter_length, hp.n_mel_channels)
    inv_basis = jnp.asarray(np.linalg.pinv(basis))
    linear = jnp.maximum(
        1e-10,
        jnp.einsum("fm,bmt->bft", inv_basis, amp,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST),
    )
    y = griffin_lim(linear ** hp.power, hp, key)
    return inv_preemphasis(y, hp.preemphasis, hp.preemphasize)


def frames_to_hours(n_frames, hp: HParams) -> float:
    """Total mel-frame count -> audio hours (``utils/audio.py:412-413``)."""
    return sum(int(n) for n in n_frames) * hp.frame_shift_ms / (3600 * 1000)


def get_duration(audio_arr, hp: HParams) -> float:
    """Waveform length in seconds (``utils/audio.py:416-417``)."""
    return len(audio_arr) / hp.sample_rate


# Alias matching the reference's linear-spectrogram inversion entry point
# (``utils/audio.py:128-132``).
inv_spectrogram = inv_linear_spectrogram
