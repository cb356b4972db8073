"""Generate mel-parity golden arrays (tests/golden/mel_golden.npz).

librosa is not installable in this environment, so the goldens are produced
by an INDEPENDENT scalar transcription of librosa's published algorithm
(librosa.filters.mel with htk=False, norm='slaney' — the default the
reference relies on via ``utils/audio.py:213-226`` and
``waveglow/mel2samp.py``'s TacotronSTFT):

* Slaney mel scale: linear below 1 kHz (mel = 3 f / 200), logarithmic above
  (mel = 15 + 27 · ln(f/1000) / ln 6.4) — so mel(1000 Hz) = 15 exactly and
  mel(6400 Hz) = 42 exactly (anchors asserted in tests/test_mel_golden.py).
* Triangular filters between n_mels+2 mel-uniform points, Slaney area
  normalization 2/(f_hi − f_lo).

The code here is deliberately scalar/loop-based and shares NOTHING with
text2speech_tpu.dsp.filters (vectorized) — a wrong Slaney detail in either
implementation cannot cancel out.

The full-spectrogram golden runs a plain frame-loop numpy STFT (centered
reflect pad, periodic Hann, np.fft.rfft) + the reference's dB chain
(``utils/audio.py:78-84``: 20·log10(max(1e-5, mel basis @ |D|)) − 20).

Run from the repo root:  python tests/golden/gen_mel_golden.py
"""

import math
import os

import numpy as np


def hz_to_mel(f: float) -> float:
    if f < 1000.0:
        return f * 3.0 / 200.0
    return 15.0 + 27.0 * math.log(f / 1000.0) / math.log(6.4)


def mel_to_hz(m: float) -> float:
    if m < 15.0:
        return m * 200.0 / 3.0
    return 1000.0 * math.exp((m - 15.0) * math.log(6.4) / 27.0)


def mel_basis(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float):
    n_bins = 1 + n_fft // 2
    pts = [
        mel_to_hz(hz_to_mel(fmin) + (hz_to_mel(fmax) - hz_to_mel(fmin)) * i / (n_mels + 1))
        for i in range(n_mels + 2)
    ]
    out = np.zeros((n_mels, n_bins), np.float64)
    for m in range(n_mels):
        f_lo, f_c, f_hi = pts[m], pts[m + 1], pts[m + 2]
        norm = 2.0 / (f_hi - f_lo)
        for k in range(n_bins):
            f = k * sr / 2.0 / (n_bins - 1)
            lower = (f - f_lo) / (f_c - f_lo)
            upper = (f_hi - f) / (f_hi - f_c)
            w = min(lower, upper)
            if w > 0.0:
                out[m, k] = w * norm
    return out


def fixture_signal(sr: int = 22050, seconds: float = 1.0) -> np.ndarray:
    """Deterministic broadband fixture: three decaying partials + a chirp."""
    t = np.arange(int(sr * seconds)) / sr
    y = (
        0.5 * np.sin(2 * np.pi * 440.0 * t) * np.exp(-t)
        + 0.25 * np.sin(2 * np.pi * 880.0 * t)
        + 0.125 * np.sin(2 * np.pi * 1320.0 * t + 0.3)
        + 0.1 * np.sin(2 * np.pi * (200.0 + 3000.0 * t) * t)
    )
    return y.astype(np.float64)


def stft_mag(y: np.ndarray, n_fft: int, hop: int, win_length: int):
    """Centered reflect-pad frame-loop |STFT| (librosa.stft conventions)."""
    pad = n_fft // 2
    yp = np.pad(y, pad, mode="reflect")
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    # center-pad the window to n_fft (librosa util.pad_center)
    w = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    w[off : off + win_length] = win
    n_frames = 1 + (len(yp) - n_fft) // hop
    mag = np.empty((1 + n_fft // 2, n_frames), np.float64)
    for i in range(n_frames):
        frame = yp[i * hop : i * hop + n_fft] * w
        mag[:, i] = np.abs(np.fft.rfft(frame))
    return mag


def main():
    out = {}
    # (sr, n_fft, n_mels, fmin, fmax): WaveGlow/TacotronSTFT config, the
    # offline chain's full-band config, and the hparams sample rate.
    configs = {
        "basis_22050_1024_80_0_8000": (22050, 1024, 80, 0.0, 8000.0),
        "basis_22050_1024_80_0_11025": (22050, 1024, 80, 0.0, 11025.0),
        "basis_44800_1024_80_0_22400": (44800, 1024, 80, 0.0, 22400.0),
    }
    for name, (sr, n_fft, n_mels, fmin, fmax) in configs.items():
        out[name] = mel_basis(sr, n_fft, n_mels, fmin, fmax).astype(np.float32)

    # full offline-chain mel spectrogram of the fixture
    # (utils/audio.py:78-84: amp_to_db(mel @ |STFT|) - ref_level_db)
    sr, n_fft, hop, win, n_mels = 22050, 1024, 256, 1024, 80
    y = fixture_signal(sr)
    mag = stft_mag(y, n_fft, hop, win)
    basis = mel_basis(sr, n_fft, n_mels, 0.0, sr / 2.0)
    mel = 20.0 * np.log10(np.maximum(1e-5, basis @ mag)) - 20.0
    out["fixture_mel_22050"] = mel.astype(np.float32)

    path = os.path.join(os.path.dirname(__file__), "mel_golden.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()
