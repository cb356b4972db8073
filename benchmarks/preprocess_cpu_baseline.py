#!/usr/bin/env python
"""Measure the REFERENCE's CPU preprocessing chain (the baseline denominator
for bench.py's ``preprocess_mel_frames_per_sec``).

Faithful numpy re-timing of ``/root/reference/datasets/kss.py:45-160`` per
utterance: wav decode -> peak rescale -> silence trim (librosa.effects.trim
semantics: frame-RMS dB vs top_db below peak) -> **mel STFT** -> **linear
STFT** (the reference computes the STFT twice, kss.py:102-110) -> reflect
pad -> truncate -> ``np.savez``.  The STFT is the vectorized numpy
equivalent of librosa.stft (stride-tricks framing + batched ``np.fft.rfft``)
so the baseline is not handicapped by a python frame loop.

Runs the same synthetic workload as bench.py::bench_preprocess
(64 utterances x 3 s at 22.05 kHz) and prints one JSON line.

    python benchmarks/preprocess_cpu_baseline.py [--n_utts 64] [--seconds 3]
"""

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

import numpy as np
from numpy.lib.stride_tricks import as_strided
from scipy.io import wavfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text2speech_tpu.text import text_to_sequence  # same tokenizer work


# --- reference DSP chain, plain numpy (utils/audio.py equivalents) ---------

N_FFT, HOP, WIN = 1024, 256, 1024
MIN_LEVEL = 1e-5           # 10^(min_level_db/20), min_level_db = -100
REF_LEVEL_DB = 20.0


def _hann(n):
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


_WINDOW = _hann(WIN)


def _frame(y: np.ndarray, frame_length: int, hop: int) -> np.ndarray:
    n = 1 + (len(y) - frame_length) // hop
    return as_strided(
        y, shape=(n, frame_length),
        strides=(y.strides[0] * hop, y.strides[0]),
    )


def stft_mag(y: np.ndarray) -> np.ndarray:
    """|librosa.stft(y)|: centered reflect pad, periodic hann, rfft."""
    yp = np.pad(y, N_FFT // 2, mode="reflect")
    frames = _frame(yp, N_FFT, HOP) * _WINDOW
    return np.abs(np.fft.rfft(frames, axis=1)).T      # [n_freq, n_frames]


def _hz_to_mel(f):
    f = np.asarray(f, np.float64)
    mel = f * 3.0 / 200.0
    log_reg = f >= 1000.0
    mel = np.where(
        log_reg, 15.0 + 27.0 * np.log(np.maximum(f, 1e-9) / 1000.0) / math.log(6.4),
        mel,
    )
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = m * 200.0 / 3.0
    return np.where(m >= 15.0, 1000.0 * np.exp((m - 15.0) * math.log(6.4) / 27.0), f)


def mel_basis(sr: int, n_mels: int = 80) -> np.ndarray:
    freqs = np.linspace(0, sr / 2, 1 + N_FFT // 2)
    pts = _mel_to_hz(np.linspace(0.0, _hz_to_mel(sr / 2.0), n_mels + 2))
    lower = (freqs[None, :] - pts[:-2, None]) / (pts[1:-1] - pts[:-2])[:, None]
    upper = (pts[2:, None] - freqs[None, :]) / (pts[2:] - pts[1:-1])[:, None]
    w = np.maximum(0.0, np.minimum(lower, upper))
    w *= (2.0 / (pts[2:] - pts[:-2]))[:, None]
    return w


def amp_to_db(x):
    return 20.0 * np.log10(np.maximum(MIN_LEVEL, x))


def trim_silence(y: np.ndarray, top_db=23, frame_length=512, hop=128):
    """librosa.effects.trim semantics (utils/audio.py trim_silence)."""
    rms = np.sqrt(np.mean(_frame(np.pad(y, frame_length // 2, mode="reflect"),
                                 frame_length, hop) ** 2, axis=1))
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(rms.max(), 1e-10))
    keep = np.nonzero(db > -top_db)[0]
    if len(keep) == 0:
        return y[:0]
    start = keep[0] * hop
    end = min(len(y), (keep[-1] + 1) * hop)
    return y[start:end]


def process_utterance(out_dir, wav_path, text, basis):
    sr, data = wavfile.read(wav_path)
    wav = data.astype(np.float32) / 32768.0
    wav = wav / np.abs(wav).max() * 1.0               # rescaling
    wav = trim_silence(wav)

    out = wav                                         # input_type == raw
    mel = (amp_to_db(basis @ stft_mag(wav)) - REF_LEVEL_DB).astype(np.float32)
    mel_frames = mel.shape[1]
    if mel_frames > 1000:
        return None
    linear = (amp_to_db(stft_mag(wav)) - REF_LEVEL_DB).astype(np.float32)

    pad = N_FFT // 2
    out = np.pad(out, pad, mode="reflect")[: mel_frames * HOP]
    time_steps = len(out)
    wav_id = os.path.splitext(os.path.basename(wav_path))[0]
    np.savez(
        os.path.join(out_dir, f"{wav_id}.npz"),
        audio=out.astype(np.float32), mel=mel.T, linear=linear.T,
        time_steps=time_steps, mel_frames=mel_frames, text=text,
        tokens=text_to_sequence(text), loss_coeff=1,
    )
    return mel_frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_utts", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--sr", type=int, default=22050)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="cpu_pp_")
    try:
        rng = np.random.RandomState(0)
        n = int(args.seconds * args.sr)
        t = np.arange(n) / args.sr
        paths = []
        for i in range(args.n_utts):
            sig = 0.4 * np.sin(2 * np.pi * (150 + 7 * i) * t) + 0.01 * rng.randn(n)
            p = f"{root}/1_{i:04d}.wav"
            wavfile.write(p, args.sr, (sig * 32767).astype(np.int16))
            paths.append(p)
        out = f"{root}/out"
        os.makedirs(out)
        basis = mel_basis(args.sr)

        # warm (page cache, fft plan), then time
        process_utterance(out, paths[0], "텍스트 예시 문장", basis)
        t0 = time.perf_counter()
        frames = 0
        for p in paths:
            frames += process_utterance(out, p, "텍스트 예시 문장", basis) or 0
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "reference_cpu_preprocess_mel_frames_per_sec",
            "value": round(frames / dt, 1),
            "unit": "frames/sec",
            "n_utts": args.n_utts,
            "n_frames": frames,
            "elapsed_s": round(dt, 3),
            "n_cpus": os.cpu_count(),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
