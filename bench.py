#!/usr/bin/env python
"""Benchmark: TTS throughput on the attached TPU chip.

Output protocol (round 5 — BENCH_r04 was an rc=124 timeout with an EMPTY
tail, so the record must survive being killed mid-run):

- Each section prints ONE self-contained JSON line the moment its number
  exists: ``{"bench_section": name, <metric keys>, "elapsed_s": ...}`` —
  a truncated run's tail still carries every completed measurement.
- The LAST line is a COMPACT aggregate the driver parses:
  ``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
  <headline + witness keys>, "truncated": [skipped sections]}`` — sized
  under the largest line proven to survive the driver's tail cap (r3's
  723-char aggregate).  The penultimate line (``"bench_full": true``)
  carries EVERY measured key for tails large enough to hold it.
- A wall-clock budget (``T2S_BENCH_BUDGET_S``, default 1500 s, counted from
  process start INCLUDING the TPU-tunnel wait) is checked between sections
  against a conservative cold-cache cost estimate per section; sections that
  don't fit are skipped, listed in ``truncated``, and the aggregate still
  prints.  Sections run headline-first (chip calibration -> vocoder
  bf16/int8 -> tacotron decode -> training -> preprocess -> the end-to-end
  continuous-batching serve section) so a bad-tunnel day degrades from the
  tail, never the headline.

Methodology: the device sits behind a high-latency tunnel where per-dispatch
wall timing mostly measures RPC latency, so each stage is timed by **batch
scaling**: run the jitted stage at batch B and 4B (both pre-compiled, both
blocked on a scalar readback, inputs resident on device) and attribute
T(4B) - T(B) to 3B batch-items of pure compute.  Sanity anchor: chained-matmul
calibration measures this chip at ~200 TFLOP/s bf16 (v5e peak ~197).

Primary metric: WaveGlow vocoder samples/sec/chip vs the only published
reference number (2.75e6 samples/sec on V100, waveglow/README.md:15-17).
Extras: Tacotron mel frames/sec and the end-to-end real-time factor
(north-star target >50x realtime per chip, BASELINE.json).

The retracted int8-decode A/B (a documented wash at b16/b64 — CLAUDE.md
"Measured numbers", docs/KERNELS.md appendix) is no longer re-measured every
round; ``benchmarks/train_bench.py`` and the serving policy keep the
capability and the crossover rule.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax

_T0 = time.time()
BUDGET_S = float(os.environ.get("T2S_BENCH_BUDGET_S", "1500"))


def _remaining() -> float:
    return BUDGET_S - (time.time() - _T0)


def _emit(obj: dict) -> None:
    print(json.dumps(obj), flush=True)

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_bench_cache")),
)

import jax.numpy as jnp

V100_BASELINE_SAMPLES_PER_SEC = 2_750_000.0
SR = 22050
HOP = 256


def _time_scaled(fn, args_small, args_big, scale_items: int, repeats: int = 5):
    """Median of (T(big) - T(small)) / scale_items with scalar-readback
    blocking; both variants pre-compiled and warmed.  The median is taken
    over UNCLAMPED diffs (tunnel jitter can make individual diffs negative;
    clamping before the median would turn noise into a bogus huge rate) and
    only the final median is floored."""
    for args in (args_small, args_big):
        float(fn(*args))  # compile + warm
    diffs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args_small))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(*args_big))
        t_big = time.perf_counter() - t0
        diffs.append(t_big - t_small)
    return max(float(np.median(diffs)), 1e-9) / scale_items


def bench_chip_calibration(n: int = 4096, n1: int = 16, n2: int = 176,
                           repeats: int = 5) -> float:
    """Chained bf16-matmul wall, TFLOP/s — the rig-health anchor emitted
    with every record so a depressed session is self-diagnosing (healthy
    calibration + low stage numbers = program issue; low calibration =
    rig/tunnel weather).  v5e peak is ~197; this methodology reproduces
    ~200.  An orthogonal chain matrix keeps the iterates norm-stable, and
    iteration differencing (T(n2) - T(n1) over n2-n1 matmuls) cancels the
    tunnel dispatch like every other bench here."""
    rng = np.random.RandomState(0)
    q, _ = np.linalg.qr(rng.randn(n, n).astype(np.float32))
    w = jnp.asarray(q, jnp.bfloat16)
    x0 = jnp.asarray(rng.randn(n, n) * 0.1, jnp.bfloat16)

    def chain(k):
        @jax.jit
        def run(x, w_):
            def body(_, c):
                return jnp.dot(c, w_, preferred_element_type=jnp.bfloat16)
            y = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(y.astype(jnp.float32))
        return run

    short, long = chain(n1), chain(n2)
    jax.block_until_ready((x0, w))
    for fn in (short, long):
        float(fn(x0, w))
    diffs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(short(x0, w))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(long(x0, w))
        tl = time.perf_counter() - t0
        diffs.append(tl - ts)
    sec = max(float(np.median(diffs)), 1e-9) / (n2 - n1)
    return 2 * n**3 / sec / 1e12


def bench_waveglow(batch: int = 4, frames: int = 400):
    """Fused-Pallas serving path (bf16 WN-layer kernels with in-kernel cond
    projection + in-place skip accumulation; fp32 coupling/convinv islands —
    the TPU analogue of the reference's fp16-with-fp32-convinv inference,
    waveglow/inference.py:41-43)."""
    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.models.waveglow import WaveGlow
    from text2speech_tpu.models.waveglow_fused import infer_fused

    cfg = WaveGlowConfig(sampling_rate=SR)
    model = WaveGlow(cfg)
    rng = jax.random.PRNGKey(0)
    seg = cfg.segment_length
    variables = jax.jit(model.init)(
        rng,
        jnp.zeros((1, cfg.n_mel_channels, seg // cfg.hop_length + 1)),
        jnp.zeros((1, seg)),
    )
    jax.block_until_ready(variables)

    def mel(b):
        return jnp.asarray(
            np.random.RandomState(0).randn(b, cfg.n_mel_channels, frames),
            jnp.float32,
        )

    infer = jax.jit(
        lambda p, m, k: jnp.mean(infer_fused(p, cfg, m, k, 0.666))
    )
    params = variables["params"]
    m1, m4 = mel(batch), mel(4 * batch)
    jax.block_until_ready((m1, m4))
    sec_per_item = _time_scaled(
        infer, (params, m1, rng), (params, m4, rng), 3 * batch
    )
    # infer returns exactly frames * stride samples (the subpixel upsample
    # cut removes the (kernel - stride) transposed-conv tail): [B, F*256].
    samples_per_item = frames * cfg.upsample_stride
    return samples_per_item / sec_per_item


def bench_waveglow_int8(batch: int = 4, frames: int = 400):
    """Int8-quantized fused serving path (``wn_block_int8``): the three big
    WN matmul families run on the MXU in int8 (~2x the bf16 FLOP rate —
    this chip probes 303 TOP/s int8 vs 163 TFLOP/s bf16 on plain chained
    matmuls).  Per-row dynamic activation scales, per-channel static weight
    scales, fixed-127 gated activations; fidelity pinned in
    tests/test_int8_vocoder.py."""
    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.models.waveglow import WaveGlow
    from text2speech_tpu.models.waveglow_fused import (
        infer_fused_int8,
        quantize_waveglow_int8,
    )

    cfg = WaveGlowConfig(sampling_rate=SR)
    model = WaveGlow(cfg)
    rng = jax.random.PRNGKey(0)
    seg = cfg.segment_length
    variables = jax.jit(model.init)(
        rng,
        jnp.zeros((1, cfg.n_mel_channels, seg // cfg.hop_length + 1)),
        jnp.zeros((1, seg)),
    )
    qparams = jax.tree.map(
        jnp.asarray, quantize_waveglow_int8(variables["params"], cfg)
    )
    jax.block_until_ready(qparams)

    def mel(b):
        return jnp.asarray(
            np.random.RandomState(0).randn(b, cfg.n_mel_channels, frames),
            jnp.float32,
        )

    infer = jax.jit(
        lambda qp, m, k: jnp.mean(infer_fused_int8(qp, cfg, m, k, 0.666))
    )
    m1, m4 = mel(batch), mel(4 * batch)
    jax.block_until_ready((m1, m4))
    sec_per_item = _time_scaled(
        infer, (qparams, m1, rng), (qparams, m4, rng), 3 * batch
    )
    return frames * cfg.upsample_stride / sec_per_item


def bench_tacotron(batch: int = 16, t_in: int = 128, base_steps: int = 400):
    """Decode throughput in mel frames/sec.

    The decoder is a sequential scan, so batch scaling measures ~0 marginal
    cost; instead the **scan length** is scaled (400 vs 800 steps, same
    batch) and the difference attributed to 400 steps of pure decode.
    Measured at batch 16 (the headline number) and batch 64 (serving
    scale).

    What bounds it (measured, round 3): the decoder streams ~36 MB of bf16
    weights per step against 779 GB/s measured HBM read bandwidth — a
    ~47 us/step floor if nothing stays resident; XLA pins the VMEM-fitting
    loop-invariant slice, and measured step time (24 us @b16, 45 us @b64)
    sits between the all-resident and none-resident bounds.  Decode is
    WEIGHT-STREAMING-bound, so batch rides along nearly free (the same
    streamed weights serve more rows: b64 = ~2.1x b16 aggregate) and a
    fused decoder-step Pallas kernel cannot beat the floor (36 MB > 16 MB
    VMEM).  The unbuilt lever is weight quantization.
    """
    from text2speech_tpu.config import HParams
    from text2speech_tpu.models.tacotron2 import Tacotron2
    from text2speech_tpu.text import N_SYMBOLS

    hp = HParams(sample_rate=SR, max_decoder_steps=2 * base_steps)
    # bf16 serving precision (attention softmax stays fp32 inside the model)
    model = Tacotron2(hp, n_vocab=N_SYMBOLS, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((batch, t_in), jnp.int32) + 3
    lengths = jnp.full((batch,), t_in, jnp.int32)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": rng},
        text, lengths,
        jnp.zeros((batch, hp.n_mel_channels, 64)),
        jnp.full((batch,), 64, jnp.int32),
    )
    jax.block_until_ready(variables)

    def make_infer(n_steps):
        return jax.jit(
            lambda v, t, l, k: jnp.mean(
                model.apply(
                    v, t, text_lengths=l, max_steps=n_steps,
                    method=Tacotron2.inference, rngs={"dropout": k},
                )[1]
            )
        )

    short, long = make_infer(base_steps), make_infer(2 * base_steps)
    for fn in (short, long):
        float(fn(variables, text, lengths, rng))
    diffs = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(short(variables, text, lengths, rng))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(long(variables, text, lengths, rng))
        t_l = time.perf_counter() - t0
        diffs.append(t_l - t_s)
    sec = max(float(np.median(diffs)), 1e-9)
    return batch * base_steps / sec  # aggregate mel frames / sec


def bench_tacotron_int8(batch: int = 16, t_in: int = 128,
                        base_steps: int = 400):
    """ON-DEMAND since round 5 (not in the driver record): the int8-decode
    A/B is a documented wash and re-measuring it cost two cold compiles per
    round (VERDICT r4 weak #1).  Decode throughput with int8-quantized decoder weights
    (models/tacotron_serve.py): decode is weight-streaming-bound, so int8
    storage halves the per-step HBM traffic — via TRUE int8 MXU dots
    (row-quantized activations, `_qdot`); an LSTM-only scan measures
    1.96x vs bf16.  The FULL decode does not realize it: interleaved
    repeats read ~1.0x @b16 (wash, +-13% session noise) and ~1.03x @b64
    (XLA VMEM-pins the bf16 hh kernels at b16; the non-LSTM step work is
    identical in both programs).  A one-session 1.72M/1.20x @b64 reading
    was retracted as non-reproducible (docs/KERNELS.md appendix) —
    serving auto-selects bf16 below INT8_DECODE_MIN_BATCH.  Same
    scan-length-scaling methodology as :func:`bench_tacotron`."""
    import numpy as np

    from text2speech_tpu.config import HParams
    from text2speech_tpu.models.tacotron2 import DecoderState, Tacotron2
    from text2speech_tpu.models.tacotron_serve import (
        decode_chunk_serve,
        extract_decoder_params,
        quantize_decoder_params,
    )
    from text2speech_tpu.text import N_SYMBOLS

    hp = HParams(sample_rate=SR, max_decoder_steps=2 * base_steps)
    model = Tacotron2(hp, n_vocab=N_SYMBOLS, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((batch, t_in), jnp.int32) + 3
    lengths = jnp.full((batch,), t_in, jnp.int32)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": rng},
        text, lengths,
        jnp.zeros((batch, hp.n_mel_channels, 64)),
        jnp.full((batch,), 64, jnp.int32),
    )
    dp = quantize_decoder_params(extract_decoder_params(variables, hp))
    memory = jax.jit(
        lambda v, t, l: model.apply(
            v, t, text_lengths=l, method=Tacotron2.encode
        )
    )(variables, text, lengths)
    pmem = jax.jit(
        lambda v, m: model.apply(
            v, m, method=lambda mod, mm: mod.decoder.attention.process_memory(mm)
        )
    )(variables, memory)

    def z(d):
        return jnp.zeros((batch, d), memory.dtype)

    state = DecoderState(
        z(hp.attention_rnn_dim), z(hp.attention_rnn_dim),
        z(hp.decoder_rnn_dim), z(hp.decoder_rnn_dim),
        jnp.zeros((batch, t_in), memory.dtype),
        jnp.zeros((batch, t_in), memory.dtype),
        z(hp.enc_conv_channels),
    )
    frame = jnp.zeros((batch, hp.n_mel_channels), memory.dtype)
    finished = jnp.zeros((batch,), bool)
    all_rngs = jax.random.split(rng, 2 * base_steps)
    jax.block_until_ready((memory, pmem))

    def make(n_steps):
        return jax.jit(
            lambda dp, mem, pm, st, fr, fi, sr_, le: jnp.mean(
                decode_chunk_serve(
                    dp, hp, mem, pm, st, fr, fi, sr_, le,
                    dtype=jnp.bfloat16,
                )[1].astype(jnp.float32)
            )
        )
    short, long = make(base_steps), make(2 * base_steps)
    args = (dp, memory, pmem, state, frame, finished)
    for fn, rr in ((short, all_rngs[:base_steps]), (long, all_rngs)):
        float(fn(*args, rr, lengths))
    diffs = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(short(*args, all_rngs[:base_steps], lengths))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(long(*args, all_rngs, lengths))
        t_l = time.perf_counter() - t0
        diffs.append(t_l - t_s)
    sec = max(float(np.median(diffs)), 1e-9)
    return batch * base_steps / sec


def bench_preprocess(n_utts: int = 64, seconds: float = 3.0, sr: int = 22050,
                     repeats: int = 3) -> dict:
    """Corpus preprocessing throughput (mel frames/sec) on a synthetic
    KSS-shaped corpus: native wav decode -> trim -> batched device
    mel+linear -> npz (BASELINE.json metric #1).

    This figure is TRANSFER-bound on this rig (BASELINE.md breakdown), so
    the record must be self-diagnosing: alongside the median of
    ``repeats`` timed passes it reports the run spread, the tunnel's
    H2D/D2H bandwidth measured inline (fresh device arrays — np.asarray
    caches the host copy), and the transfer bound those bandwidths imply
    for this corpus's bytes.  A contended run then shows up as
    measured << derived_bound with depressed link numbers, instead of
    reading as a mystery regression (r01 7.4k / r02 3.7k / r03 6.0k)."""
    import shutil
    import sys as _sys
    import tempfile

    from scipy.io import wavfile

    from text2speech_tpu.config import HParams
    from text2speech_tpu.data.preprocess import (
        choose_trim_impl,
        preprocess_corpus,
        probe_trim_costs,
    )

    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    from preprocess_diag import measure_d2h_MBps

    hp = HParams(sample_rate=sr)
    root = tempfile.mkdtemp(prefix="bench_pp_")
    try:
        os.makedirs(f"{root}/1")
        rng = np.random.RandomState(0)
        lines = []
        n = int(seconds * sr)
        t = np.arange(n) / sr
        for i in range(n_utts):
            sig = 0.4 * np.sin(2 * np.pi * (150 + 7 * i) * t) + 0.01 * rng.randn(n)
            wavfile.write(
                f"{root}/1/1_{i:04d}.wav", sr, (sig * 32767).astype(np.int16)
            )
            lines.append(f"1/1_{i:04d}.wav|텍스트 예시 문장|텍스트 예시 문장|3.0초")
        with open(f"{root}/transcript.txt", "w", encoding="utf-8") as f:
            f.write("\n".join(lines))
        out = f"{root}/out"
        # resolve the auto trim placement ONCE up front (what the default
        # CLI path does; the probe caches per-process) so the timed runs
        # measure the auto-selected configuration without re-probing, and
        # so the transfer-bound model below matches the chosen path
        h2d0, host_sps = probe_trim_costs(hp)
        impl = choose_trim_impl(h2d0, host_sps, float(n))
        # warm the device program on a copy-shaped run, then time
        meta = preprocess_corpus(hp, root, out, device_batch=16,
                                 trim_impl=impl)
        fps_runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            meta = preprocess_corpus(hp, root, out, device_batch=16,
                                     trim_impl=impl)
            fps_runs.append(
                sum(int(m[4]) for m in meta) / (time.perf_counter() - t0))
        frames = sum(int(m[4]) for m in meta)
        med = float(np.median(fps_runs))

        # transfer-bound model for THIS corpus (mirrors preprocess_corpus's
        # upload/drain shapes): device trim uploads audio twice (bounds
        # pass + padded STFT pass, both 16384-sample-bucketed), host trim
        # once; the drain ships f32 mel+linear sliced to the
        # 16-frame-bucketed extent.  H2D reuses the probe's reading so the
        # trim decision and the derived bound can't disagree (and the
        # section pushes the 48 MB H2D probe through the tunnel once).
        h2d_mbs, d2h_mbs = h2d0, measure_d2h_MBps()
        pad = hp.filter_length // 2
        bucket = 16384
        t_trim = (-(-n // bucket) * bucket) if impl == "device" else 0
        t_stft = -(-(n + 2 * pad) // bucket) * bucket
        f_item = -(-(1 + n // hp.hop_length) // 16) * 16
        n_spec = hp.n_mel_channels + hp.filter_length // 2 + 1
        bytes_h2d = n_utts * (t_trim + t_stft) * 4
        bytes_d2h = n_utts * f_item * n_spec * 4
        bound = frames / (bytes_h2d / (h2d_mbs * 1e6)
                          + bytes_d2h / (d2h_mbs * 1e6))
        return {
            "fps": med,
            "fps_runs": [round(f, 1) for f in fps_runs],
            "spread_pct": round(
                100.0 * (max(fps_runs) - min(fps_runs)) / med, 1),
            "trim_impl_auto": impl,
            "link_h2d_MBps": round(h2d_mbs, 1),
            "link_d2h_MBps": round(d2h_mbs, 1),
            "derived_transfer_bound_fps": round(bound, 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_preprocess_device(batch: int = 128, seconds: float = 3.0, sr: int = 22050):
    """Device DSP-core throughput (fused mel+linear MXU STFT) in mel
    frames/sec, batch-scaled with scalar readback — transfers excluded.

    This is the real-host capability number: on this rig the end-to-end
    figure (bench_preprocess) is bound by the tunnel's ~25 MB/s device->host
    link (each frame ships (80+513)*4 B of f32 spectrogram), which no real
    TPU host has (see BASELINE.md)."""
    from text2speech_tpu.config import HParams
    from text2speech_tpu.dsp.audio import mel_and_linear_spectrogram

    hp = HParams(sample_rate=sr)
    n = int(seconds * sr)
    pad = hp.filter_length // 2
    T = n + 2 * pad
    frames_per_item = 1 + n // hp.hop_length

    fn = jax.jit(
        lambda y: sum(
            jnp.mean(s) for s in mel_and_linear_spectrogram(y, hp, center=False)
        )
    )
    rng = np.random.RandomState(0)
    y1 = jnp.asarray(rng.randn(batch, T), jnp.float32)
    y4 = jnp.asarray(rng.randn(4 * batch, T), jnp.float32)
    jax.block_until_ready((y1, y4))
    sec_per_item = _time_scaled(fn, (y1,), (y4,), 3 * batch, repeats=9)
    return frames_per_item / sec_per_item


def bench_preprocess_cpu_baseline(timeout_s: float = 420.0):
    """Reference CPU chain (kss.py:45-160 numpy re-timing) on THIS host —
    the denominator for the preprocess metrics.  Subprocess timeout is
    bounded by the caller's remaining budget."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "benchmarks", "preprocess_cpu_baseline.py")],
        capture_output=True, text=True, timeout=timeout_s, check=True,
    )
    return float(json.loads(out.stdout.strip().splitlines()[-1])["value"])


def _wait_for_tpu(max_wait_s: float = 5400.0, probe_timeout_s: float = 180.0):
    """The dev tunnel occasionally drops for tens of minutes (single-client,
    remote).  Backend-init failure is process-fatal, so probe device
    availability in SUBPROCESSES (each fully exits before the next attempt —
    the tunnel rejects concurrent clients) and wait a bounded time before
    letting the real run proceed.  No-op once a probe sees a device."""
    import subprocess
    import sys

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.devices()[0].platform != 'cpu', "
                 "'CPU fallback is not the TPU being probed for'"],
                capture_output=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print(
                f"# TPU probe failed {attempt}x over {max_wait_s:.0f}s; "
                "proceeding anyway", flush=True, file=sys.stderr,
            )
            return
        print(f"# TPU tunnel unavailable (probe {attempt}); retrying...",
              flush=True, file=sys.stderr)
        time.sleep(60)


def _run_sections(sections):
    """Run (name, est_cold_s, fn) tuples under the wall-clock budget.

    A section is skipped when the remaining budget can't cover its
    conservative cold-cache estimate (compiles can't be preempted once
    started, so the check is up-front); skips and errors each emit their
    own JSON line and never block later, cheaper sections from being
    attempted if budget frees up (warm-cache sections finish far under
    their estimates)."""
    results, truncated, failed = {}, [], {}
    for name, est_s, fn in sections:
        rem = _remaining()
        if rem < est_s:
            truncated.append(name)
            _emit({"bench_section": name, "skipped": "budget",
                   "remaining_s": round(rem, 1), "est_s": est_s})
            continue
        t0 = time.time()
        try:
            out = fn()
        except Exception as e:  # a failed section must not kill the record
            failed[name] = repr(e)[:200]
            _emit({"bench_section": name, "error": repr(e)[:200]})
            continue
        results[name] = out
        _emit({"bench_section": name,
               "elapsed_s": round(time.time() - t0, 1), **out})
    return results, truncated, failed


def _serve_record_to_keys(rec):
    """Map a ``serve_bench.run_serve_bench`` record onto namespaced bench
    keys (the aggregate line merges every section's dict, so the serving
    section must not collide with generic keys like ``value``)."""
    out = {"serve_samples_per_sec_measured": rec["value"],
           "serve_shed_rate": rec["overload"]["shed_rate"]}
    for k in ("wall_s", "rounds", "slot_occupancy", "aggregate_rtf",
              "first_audio_first_wave_ms_p50", "first_audio_ms_p50",
              "first_audio_ms_p95", "inter_chunk_gap_ms_p50",
              "inter_chunk_gap_ms_p95",
              "derived_device_samples_per_sec", "tunnel_tax_factor"):
        out["serve_" + k] = rec[k]
    return out


def _train_bench():
    import sys as _sys

    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    import train_bench as _tb
    return _tb


def main():
    _emit({"bench_start": True, "budget_s": BUDGET_S})
    # The tunnel wait counts against the budget: waiting longer than ~60%
    # of it leaves too little to measure anything, so give up earlier and
    # let the sections fail fast (their errors still land in the tail).
    _wait_for_tpu(max_wait_s=max(min(0.6 * _remaining(), 5400.0), 60.0))

    _tb = _train_bench()

    # (name, conservative cold-cache estimate in s, fn) — headline first.
    # Estimates reflect this rig's remote-compile queue (2 program variants
    # per section, minutes each cold; warm-cache runs finish in 10-60 s).
    sections = [
        ("chip_calibration", 120,
         lambda: {"chip_bf16_tflops": round(bench_chip_calibration(), 1)}),
        ("vocoder_bf16", 240, lambda: (lambda v: {
            "vocoder_samples_per_sec_per_chip": round(v, 1),
            "vocoder_vs_baseline": round(v / V100_BASELINE_SAMPLES_PER_SEC, 3),
            "vocoder_rtf": round(v / SR, 1),
        })(bench_waveglow())),
        ("vocoder_int8", 240, lambda: (lambda v: {
            "vocoder_samples_per_sec_int8": round(v, 1),
            "vocoder_int8_vs_baseline": round(
                v / V100_BASELINE_SAMPLES_PER_SEC, 3),
        })(bench_waveglow_int8())),
        ("tacotron_b16", 240, lambda: {
            "tacotron_frames_per_sec": round(bench_tacotron(), 1)}),
        ("tacotron_b64", 240, lambda: {
            "tacotron_frames_per_sec_b64": round(bench_tacotron(batch=64), 1)}),
        # training-step throughput (VERDICT r3 #2 / r4 #1: the driver record
        # must witness the train claims) — the exact train_bench.py programs
        # at their documented shapes.  WaveGlow runs the bf16-vs-f32 A/B
        # (VERDICT r4 #2): the shipping config is bf16 compute
        # (train/waveglow.py --bf16); f32 quantifies what that knob buys.
        ("train_waveglow_bf16", 300, lambda: (lambda r: {
            "train_waveglow_samples_per_sec": round(r["samples_per_sec"], 1),
            "train_waveglow_bf16_samples_per_sec":
                round(r["samples_per_sec"], 1),
            "train_waveglow_mfu": round(r["mfu"], 3),
        })(_tb.bench_waveglow_train(bf16=True))),
        # the f32 A/B runs at batch=2: f32 at the default batch-3 pair OOMs
        # HBM (the 4x timing variant at batch 12 needs 18.29G of 15.75G —
        # bf16 halves activation memory, which is what makes the reference
        # batch trainable at all; docs/KERNELS.md).  The same-shape bf16
        # control gives the clean precision ratio (measured 1.46x).
        ("train_waveglow_f32_ab", 420, lambda: (lambda rf, rb: {
            "train_waveglow_f32_samples_per_sec":
                round(rf["samples_per_sec"], 1),
            "train_waveglow_f32_mfu": round(rf["mfu"], 3),
            "train_waveglow_bf16_b2_samples_per_sec":
                round(rb["samples_per_sec"], 1),
            "train_waveglow_bf16_vs_f32": round(
                rb["samples_per_sec"] / rf["samples_per_sec"], 3),
        })(_tb.bench_waveglow_train(batch=2, bf16=False),
           _tb.bench_waveglow_train(batch=2, bf16=True))),
        ("train_tacotron_f32_b8", 240, lambda: (lambda r: {
            "train_tacotron_frames_per_sec_f32_b8":
                round(r["frames_per_sec"], 1),
            "train_tacotron_mfu_f32_b8": round(r["mfu"], 3),
        })(_tb.bench_tacotron_train(batch=8))),
        ("train_tacotron_bf16_b32", 240, lambda: (lambda r: {
            "train_tacotron_frames_per_sec_bf16_b32":
                round(r["frames_per_sec"], 1),
            "train_tacotron_mfu_bf16_b32": round(r["mfu"], 3),
        })(_tb.bench_tacotron_train(batch=32, bf16=True))),
        ("preprocess_e2e", 240, lambda: (lambda pp: {
            "preprocess_mel_frames_per_sec": round(pp["fps"], 1),
            "preprocess_e2e_runs": pp["fps_runs"],
            "preprocess_e2e_spread_pct": pp["spread_pct"],
            "preprocess_trim_impl_auto": pp["trim_impl_auto"],
            "preprocess_link_h2d_MBps": pp["link_h2d_MBps"],
            "preprocess_link_d2h_MBps": pp["link_d2h_MBps"],
            "preprocess_derived_transfer_bound_fps":
                pp["derived_transfer_bound_fps"],
        })(bench_preprocess())),
        ("preprocess_device", 120, lambda: {
            "preprocess_device_frames_per_sec":
                round(bench_preprocess_device(), 1)}),
        ("preprocess_cpu_baseline", 180, lambda: {
            "preprocess_cpu_baseline_frames_per_sec":
                bench_preprocess_cpu_baseline(
                    timeout_s=max(min(_remaining() - 30.0, 420.0), 60.0))}),
    ]
    results, truncated, failed = _run_sections(sections)

    flat = {}
    for out in results.values():
        flat.update(out)

    # End-to-end serving section (r4 VERDICT #4): run the continuous-
    # batching server against the chip, budget permitting.  Placed after
    # every headline section because its warmup wave compiles the whole
    # serving program set — cache-stable shapes, but a cold day costs
    # ~13 min, so the conservative estimate makes it self-skip when tight.
    # Passes this run's own measured stage rates into the derived
    # device-work bound; SERVE_r{N}.json holds the full-record bf16/int8
    # pair from a standalone invocation.
    def _serve_section():
        import serve_bench as _sb  # benchmarks/ on sys.path via _train_bench

        rec = _sb.run_serve_bench(
            decode_fps=flat.get("tacotron_frames_per_sec") or 590_000.0,
            vocoder_sps=(flat.get("vocoder_samples_per_sec_per_chip")
                         or 2_900_000.0),
        )
        return _serve_record_to_keys(rec)

    r_serve, t_serve, f_serve = _run_sections([("serve_e2e", 800,
                                                _serve_section)])
    for out in r_serve.values():
        flat.update(out)
    truncated += t_serve
    failed.update(f_serve)

    wg_sps = flat.get("vocoder_samples_per_sec_per_chip")
    wg_sps_int8 = flat.get("vocoder_samples_per_sec_int8")
    taco_fps = flat.get("tacotron_frames_per_sec")

    # End-to-end: 1 second of audio needs SR/HOP mel frames then SR samples;
    # stages run sequentially.
    e2e_rtf = (
        1.0 / ((SR / HOP) / taco_fps + SR / wg_sps)
        if wg_sps and taco_fps else None
    )

    # First-audio latency, derived from the measured components (the tunnel's
    # ~seconds of RPC overhead makes single-shot wall timing dishonest, so
    # latency is composed from scaling-measured rates).  Streaming
    # (Synthesizer.synthesize_incremental): the engine emits its first audio
    # once chunk + overlap POSTNET-FINAL frames exist, and the mel stream
    # withholds a postnet receptive field (prf) behind the decode frontier,
    # so decode runs ceil((chunk + ov + prf) / chunk) whole chunks first;
    # the vocoder then runs one FIRST window of chunk + overlap frames (the
    # engine's first-window fast path: a window pinned at the utterance
    # start needs no leading overlap, and the trailing ov frames of the
    # steady-state chunk + 2*ov window are outside every emitted sample's
    # receptive field — infer.incremental_vocode_stream_batch).  Decode
    # per-step time uses the batch-16 measurement — decode is
    # weight-streaming-bound, so B=1 per-step is <= the b16 figure (same
    # streamed weights, fewer rows).  Non-streaming baseline: the full
    # max_decoder_steps scan plus a full-utterance vocode.  Encoder pass
    # (~1 conv stack + BiLSTM over ~128 tokens) excluded from both: <0.5 ms.
    derived = {}
    if wg_sps and taco_fps:
        import inspect

        from text2speech_tpu.config import HParams, WaveGlowConfig
        from text2speech_tpu.infer import Synthesizer
        from text2speech_tpu.models.chunked import receptive_overlap_frames

        _hp = HParams(sample_rate=SR)
        _cfg = WaveGlowConfig(sampling_rate=SR)
        _ov = receptive_overlap_frames(_cfg)
        _prf = (_hp.postnet_kernel_size // 2) * _hp.postnet_n_convolutions
        _chunk = inspect.signature(
            Synthesizer.synthesize_incremental
        ).parameters["chunk_steps"].default
        _steps_first = -(-(_chunk + _ov + _prf) // _chunk) * _chunk
        _step_s = 16.0 / taco_fps            # decode seconds/step at b16
        first_audio_ms = 1000.0 * (
            _steps_first * _step_s + (_chunk + _ov) * HOP / wg_sps
        )
        first_audio_ms_batch = 1000.0 * (
            _hp.max_decoder_steps * (_step_s + HOP / wg_sps)
        )
        # 16 CONCURRENT streaming sessions (synthesize_incremental_batch):
        # the decode term is unchanged — _step_s already IS the b16 lockstep
        # rate — and the emission round's batched window vocode covers 16
        # windows.  The ~13x gap vs the single-stream figure is the vocode
        # term: 16 simultaneous starts emit 16 first windows in ONE batched
        # call, so the first byte waits for 16 windows of vocoder work
        # (simultaneous-start physics, not scheduler serialization — the
        # continuous-batching server staggers admissions into freed slots,
        # paying ~1 window).  The first-window fast path shrinks each of
        # those 16 windows from chunk + 2*ov to chunk + ov frames (~1.6x
        # less first-round work at default shapes).  Both terms are emitted
        # so the record decomposes itself.
        _fa16_decode_ms = 1000.0 * _steps_first * _step_s
        _fa16_vocode_ms = 1000.0 * 16 * (_chunk + _ov) * HOP / wg_sps
        derived.update({
            "e2e_rtf": round(e2e_rtf, 2),
            "first_audio_ms_streaming": round(first_audio_ms, 1),
            "first_audio_ms_full_scan": round(first_audio_ms_batch, 1),
            "first_audio_ms_16_sessions": round(
                _fa16_decode_ms + _fa16_vocode_ms, 1),
            "first_audio_ms_16_sessions_decode_term": round(
                _fa16_decode_ms, 1),
            "first_audio_ms_16_sessions_vocode_term": round(
                _fa16_vocode_ms, 1),
        })
    # int8 serving-chain e2e: the policy chain the server actually runs at
    # these shapes — int8 WN vocoder + bf16 decode (int8 decode is the
    # documented wash below the b32 crossover; tacotron_serve.
    # int8_decode_worthwhile).  Earlier rounds derived this key from the
    # retracted int8-decode measurement; this form is both honest and
    # cheaper to witness.
    if wg_sps_int8 and taco_fps:
        derived["e2e_rtf_int8"] = round(
            1.0 / ((SR / HOP) / taco_fps + SR / wg_sps_int8), 2)
        derived["e2e_rtf_int8_chain"] = "int8 vocoder + bf16 decode (policy)"
    if derived:
        _emit({"bench_section": "derived", **derived})

    try:
        device = str(jax.devices()[0])
    except Exception:
        device = "unavailable"
    full, compact = _final_lines(flat, derived, truncated, failed, device)
    # The driver keeps only the TAIL of stdout and parses its last JSON
    # line.  The tail's byte cap is unknown (r3's 723-char aggregate is the
    # largest line proven to parse), so the FULL record goes on its own
    # penultimate line and the LAST line is a compact core sized safely
    # under that proven bound — a small cap still lands the headline +
    # witness keys; a large cap carries everything.
    _emit(full)
    print(json.dumps(compact), flush=True)


# Keys the compact final line keeps (headline + the witness keys VERDICT r4
# asked the driver record for), in emission order.  Everything else rides in
# the per-section lines and the penultimate bench_full line.
COMPACT_KEYS = (
    "chip_bf16_tflops",
    "vocoder_samples_per_sec_int8", "vocoder_int8_vs_baseline",
    "tacotron_frames_per_sec", "tacotron_frames_per_sec_b64",
    "e2e_rtf", "e2e_rtf_int8",
    "train_waveglow_bf16_samples_per_sec", "train_waveglow_mfu",
    "train_waveglow_bf16_vs_f32",
    "train_tacotron_frames_per_sec_f32_b8",
    "train_tacotron_frames_per_sec_bf16_b32",
    "preprocess_mel_frames_per_sec",
    "serve_samples_per_sec_measured",
)


def _final_lines(flat, derived, truncated, failed, device):
    """Build the (full, compact) aggregate dicts printed as the run's last
    two lines.  Both are self-contained; compact ⊆ full."""
    merged = {**flat, **derived}
    head = {
        "metric": "vocoder_samples_per_sec_per_chip",
        "value": merged.get("vocoder_samples_per_sec_per_chip"),
        "unit": "samples/sec",
        "vs_baseline": merged.get("vocoder_vs_baseline"),
    }
    tail_keys = {
        "e2e_rtf_target": 50.0,
        "elapsed_s": round(time.time() - _T0, 1),
        "truncated": truncated,
        "device": device,
    }
    full = dict(head)
    full["bench_full"] = True
    full["budget_s"] = BUDGET_S
    for k, v in merged.items():
        full.setdefault(k, v)
    full.update(tail_keys)
    if failed:
        full["failed"] = failed
    compact = dict(head)
    for k in COMPACT_KEYS:
        if k in merged:
            compact[k] = merged[k]
    compact.update(tail_keys)
    if failed:
        # names only — the full reprs live in the section lines and the
        # bench_full line; the compact line must stay small on a bad day too
        compact["failed"] = sorted(failed)
    return full, compact


if __name__ == "__main__":
    main()
