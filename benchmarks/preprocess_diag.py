#!/usr/bin/env python
"""Stage-by-stage diagnosis of corpus-preprocess throughput on this rig.

VERDICT r2 weak #1: the end-to-end figure regressed 7.4k -> 3.7k frames/s
between rounds while the claimed tunnel bound was ~11k; three numbers that
can't all be right.  This script measures every stage independently so the
breakdown adds up:

  raw link:   H2D and D2H bandwidth of a large f32 buffer (3 reps, median)
  host stage: wav decode + trim + mu-law branch (thread pool, no device)
  device:     batch-scaled fused mel+linear STFT (transfers excluded)
  drain:      D2H of one batch's spectrograms (the e2e bottleneck candidate)
  writes:     npz serialization of one batch
  e2e:        preprocess_corpus wall time (the bench.py figure)

Prints one JSON line with all stages in mel-frames/sec plus link MB/s.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_bench_cache"),
)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 22050
N_UTTS = 64
SECONDS = 3.0


def make_corpus(root: str):
    from scipy.io import wavfile

    os.makedirs(f"{root}/1")
    rng = np.random.RandomState(0)
    lines = []
    n = int(SECONDS * SR)
    t = np.arange(n) / SR
    for i in range(N_UTTS):
        sig = 0.4 * np.sin(2 * np.pi * (150 + 7 * i) * t) + 0.01 * rng.randn(n)
        wavfile.write(
            f"{root}/1/1_{i:04d}.wav", SR, (sig * 32767).astype(np.int16)
        )
        lines.append(f"1/1_{i:04d}.wav|텍스트 예시 문장|텍스트 예시 문장|3.0초")
    with open(f"{root}/transcript.txt", "w", encoding="utf-8") as f:
        f.write("\n".join(lines))


def bw_link():
    """Raw tunnel bandwidth, MB/s each direction (32 MB f32 for D2H).

    H2D delegates to ``preprocess.measure_h2d_MBps`` — ``device_put`` +
    ``block_until_ready`` is NOT honest here (the ack returns ~12 ms for
    16 MB ≈ 1.2 GB/s apparent while bytes stream in the background); the
    honest method forces a device-side data dependence and reads a scalar
    back.  D2H uses a FRESH device array per rep — np.asarray caches the
    host copy, so re-reading the same array measures the cache, not the
    link — and IS honest (np.asarray can't return before the bytes land)."""
    from text2speech_tpu.data.preprocess import measure_h2d_MBps

    return measure_h2d_MBps(big_mb=8, reps=2), measure_d2h_MBps()


def measure_d2h_MBps():
    """Device->host bandwidth only (see bw_link docstring for the rules)."""
    buf = np.random.RandomState(0).randn(8 * 1024 * 1024).astype(np.float32)
    devs = [jax.device_put(buf + i) for i in range(3)]
    jax.block_until_ready(devs)
    d2h = []
    for d in devs:
        t0 = time.perf_counter()
        np.asarray(d)
        d2h.append(time.perf_counter() - t0)
    return buf.nbytes / 1e6 / float(np.median(d2h))


def main():
    from text2speech_tpu.config import HParams
    from text2speech_tpu.data.preprocess import (
        _device_batch_fn,
        _host_stage,
        parse_transcript,
        preprocess_corpus,
    )

    hp = HParams(sample_rate=SR)
    root = tempfile.mkdtemp(prefix="pp_diag_")
    out = f"{root}/out"
    result = {}
    try:
        make_corpus(root)
        h2d_mbs, d2h_mbs = bw_link()
        result["link_h2d_MBps"] = round(h2d_mbs, 2)
        result["link_d2h_MBps"] = round(d2h_mbs, 2)

        rows = parse_transcript(root)

        # host stage alone (8 threads like the default)
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(8)
        t0 = time.perf_counter()
        items = [
            it for it in pool.map(_host_stage, ((w, t, hp) for w, t in rows))
            if it is not None
        ]
        host_dt = time.perf_counter() - t0
        frames_total = sum(1 + it.n_samples // hp.hop_length for it in items)
        result["host_stage_fps"] = round(frames_total / host_dt, 1)
        result["frames_total"] = frames_total

        # one padded device batch (16 items) like preprocess_corpus builds
        pad = hp.filter_length // 2
        device_fn = _device_batch_fn(hp)
        chunk = items[:16]
        max_padded = max(it.n_samples for it in chunk) + 2 * pad
        T = -(-max_padded // 16384) * 16384
        batch = np.zeros((len(chunk), T), np.float32)
        for j, it in enumerate(chunk):
            batch[j, : it.n_samples + 2 * pad] = np.pad(
                it.wav, pad, mode="reflect"
            )
        frames_batch = sum(1 + it.n_samples // hp.hop_length for it in chunk)

        # H2D of one audio batch
        t0 = time.perf_counter()
        batch_dev = jax.device_put(batch)
        jax.block_until_ready(batch_dev)
        h2d_dt = time.perf_counter() - t0
        result["h2d_batch_ms"] = round(h2d_dt * 1e3, 1)
        result["h2d_batch_MB"] = round(batch.nbytes / 1e6, 2)

        # device compute, batch-scaled with scalar readback
        from text2speech_tpu.dsp.audio import mel_and_linear_spectrogram

        fn_sum = jax.jit(
            lambda y: sum(
                jnp.mean(s)
                for s in mel_and_linear_spectrogram(y, hp, center=False)
            )
        )
        b4 = jnp.concatenate([batch_dev] * 4, axis=0)
        jax.block_until_ready(b4)
        for a in (batch_dev, b4):
            float(fn_sum(a))
        diffs = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn_sum(batch_dev))
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(fn_sum(b4))
            diffs.append(time.perf_counter() - t0 - t_s)
        dev_dt = max(float(np.median(diffs)), 1e-9) / 3  # per batch
        result["device_batch_ms"] = round(dev_dt * 1e3, 2)
        result["device_fps"] = round(frames_batch / dev_dt, 1)

        # drain: D2H of one batch's full padded spectrograms (f32)
        mel_dev, lin_dev = device_fn(batch_dev)
        jax.block_until_ready((mel_dev, lin_dev))
        t0 = time.perf_counter()
        mel_b = np.asarray(mel_dev)
        lin_b = np.asarray(lin_dev)
        drain_dt = time.perf_counter() - t0
        drain_mb = (mel_b.nbytes + lin_b.nbytes) / 1e6
        result["drain_batch_ms"] = round(drain_dt * 1e3, 1)
        result["drain_batch_MB"] = round(drain_mb, 2)
        result["drain_fps"] = round(frames_batch / drain_dt, 1)

        # drain variant: slice to real frames + f16 on device before D2H
        max_frames = max(1 + it.n_samples // hp.hop_length for it in chunk)
        slim = jax.jit(
            lambda m, l, F: (
                m[:, :, :F].astype(jnp.float16),
                l[:, :, :F].astype(jnp.float16),
            ),
            static_argnums=2,
        )
        ms, ls = slim(mel_dev, lin_dev, max_frames)
        jax.block_until_ready((ms, ls))
        t0 = time.perf_counter()
        msb = np.asarray(ms)
        lsb = np.asarray(ls)
        drain2_dt = time.perf_counter() - t0
        result["drain_slim_f16_ms"] = round(drain2_dt * 1e3, 1)
        result["drain_slim_f16_MB"] = round((msb.nbytes + lsb.nbytes) / 1e6, 2)
        result["drain_slim_f16_fps"] = round(frames_batch / drain2_dt, 1)

        # npz writes of one batch
        os.makedirs(out, exist_ok=True)
        from text2speech_tpu.text import text_to_sequence

        t0 = time.perf_counter()
        for j, it in enumerate(chunk):
            frames = 1 + it.n_samples // hp.hop_length
            o = np.pad(it.out, pad, mode="reflect")[: frames * hp.hop_length]
            np.savez(
                os.path.join(out, f"w{j}.npz"),
                audio=o.astype(np.float32), mel=mel_b[j, :, :frames].T,
                linear=lin_b[j, :, :frames].T, time_steps=len(o),
                mel_frames=frames, text=it.text,
                tokens=text_to_sequence(it.text), loss_coeff=1,
            )
        write_dt = time.perf_counter() - t0
        result["write_batch_ms"] = round(write_dt * 1e3, 1)
        result["write_fps"] = round(frames_batch / write_dt, 1)

        # e2e (warm program): the bench.py figure
        shutil.rmtree(out, ignore_errors=True)
        preprocess_corpus(hp, root, out, device_batch=16)
        t0 = time.perf_counter()
        meta = preprocess_corpus(hp, root, out, device_batch=16)
        e2e_dt = time.perf_counter() - t0
        frames = sum(int(m[4]) for m in meta)
        result["e2e_fps"] = round(frames / e2e_dt, 1)
        result["e2e_s"] = round(e2e_dt, 2)

        # opt-in f16 spectrogram transfer (halves drain bytes)
        shutil.rmtree(out, ignore_errors=True)
        preprocess_corpus(hp, root, out, device_batch=16, transfer_fp16=True)
        t0 = time.perf_counter()
        meta = preprocess_corpus(hp, root, out, device_batch=16,
                                 transfer_fp16=True)
        result["e2e_fp16_fps"] = round(
            sum(int(m[4]) for m in meta) / (time.perf_counter() - t0), 1
        )

        print(json.dumps(result))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
