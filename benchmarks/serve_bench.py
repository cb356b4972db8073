#!/usr/bin/env python
"""Measure the continuous-batching server END-TO-END on the attached chip.

`bench.py` reports per-stage device rates with batch-scaling methodology
(the tunnel makes per-dispatch wall timing dishonest) and DERIVES the
serving extras from them.  This benchmark complements it by actually
RUNNING `server.make_server` against the chip: real admissions, real
per-round decode/postnet/vocode dispatches, real host-side window
assembly — the number a capacity planner gets from the whole scheduler,
not from its stages.

Caveat (printed in the JSON): each scheduling round makes ~3 device calls
with host readbacks between them.  On this rig every readback crosses the
tunnel (~100 ms RTT, ~25 MB/s D2H — CLAUDE.md gotchas #3/#6), so measured
round time = device work + tunnel tax; on a real TPU host the same
readbacks are PCIe-local (~sub-ms) and the device work dominates.  The
JSON therefore reports BOTH the measured wall numbers and the derived
device-work bound for the same rounds (from bench.py's measured stage
rates, passed via --decode_fps/--vocoder_sps) so the rig tax is explicit.

Run:  python benchmarks/serve_bench.py [--slots 16] [--int8] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_bench_cache")),
)

import jax.numpy as jnp

SR = 22050
TEXTS = [
    "안녕하세요. 오늘 날씨가 참 좋네요.",
    "이 것은 제작되고 있는 중입니다.",
    "존경하는 사람과 함께 갑니다.",
    "다음 문장을 합성해 주세요.",
]


def build_synthesizer(int8: bool, quantized_decode: bool):
    from text2speech_tpu.config import HParams, WaveGlowConfig
    from text2speech_tpu.infer import Synthesizer
    from text2speech_tpu.models.tacotron2 import Tacotron2
    from text2speech_tpu.models.waveglow import WaveGlow
    from text2speech_tpu.text import N_SYMBOLS

    hp = HParams(sample_rate=SR)
    cfg = WaveGlowConfig(sampling_rate=SR)
    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(hp, n_vocab=N_SYMBOLS, compute_dtype=jnp.bfloat16)
    tvars = jax.jit(taco.init)(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 32), jnp.int32) + 3,
        jnp.full((2,), 32, jnp.int32),
        jnp.zeros((2, hp.n_mel_channels, 64)),
        jnp.full((2,), 64, jnp.int32),
    )
    wg = WaveGlow(cfg, compute_dtype=jnp.bfloat16)
    frames = cfg.segment_length // cfg.hop_length + 1
    wvars = jax.jit(wg.init)(
        rng,
        jnp.zeros((1, cfg.n_mel_channels, frames)),
        jnp.zeros((1, cfg.segment_length)),
    )
    # bias the stop gate SHUT so every session decodes its full contract
    # (random-init gates otherwise fire immediately — half the rows read
    # sigmoid(x) > 0.5 at step 1 and the "throughput" run measures
    # one-frame sessions)
    tvars = jax.tree_util.tree_map_with_path(
        lambda path, x: x - 10.0
        if any(getattr(p, "key", None) == "gate_proj" for p in path)
        and x.ndim == 1 else x,
        tvars,
    )
    jax.block_until_ready((tvars, wvars))
    return Synthesizer(
        hp=hp, taco=taco, taco_variables=tvars,
        wg_cfg=cfg, waveglow=wg, wg_variables=wvars,
        use_denoiser=False,
        use_fused_vocoder=not int8, int8_vocoder=int8,
        quantized_decode=quantized_decode,
    )


def run_serve_bench(slots=16, chunk_steps=64, n_requests=32, max_steps=448,
                    int8=False, quantized_decode=False,
                    decode_fps=590_000.0, vocoder_sps=2_900_000.0):
    """One end-to-end continuous-batching server measurement; returns the
    record dict ``main()`` prints.  Callable in-process by ``bench.py``'s
    budget-gated serve section (the tunnel is single-client, so a
    subprocess would fight the bench run for the backend)."""
    from text2speech_tpu.server import make_server

    synth = build_synthesizer(int8, quantized_decode)
    srv = make_server(
        synth, slots=slots, chunk_steps=chunk_steps,
        max_text_len=128, max_steps=max_steps,
    )

    # warmup wave: compiles every program (decode chunk, postnet window,
    # vocoder window, row placement) before the timed run
    for t in TEXTS[: min(2, slots)]:
        srv.submit(t)
    while not srv.idle:
        srv.step()
    warm_stats = dict(srv.stats)

    # timed run — per-event timestamps give the latency DISTRIBUTIONS a
    # deployment plans against, not just aggregate throughput: per-session
    # first-audio (submit -> first chunk, queue wait included), per-session
    # inter-chunk gaps (stream smoothness), and queue depth per round
    t_submit = {}
    for i in range(n_requests):
        sid = srv.submit(TEXTS[i % len(TEXTS)], seed=i)
        t_submit[sid] = time.perf_counter()
    round_s = []
    queue_depth = []
    ev_times: dict[int, list] = {}
    t_all0 = time.perf_counter()
    while not srv.idle:
        t0 = time.perf_counter()
        events = srv.step()
        now = time.perf_counter()
        round_s.append(now - t0)
        queue_depth.append(len(srv._queue))
        for ev in events:
            if ev.audio is not None and np.size(ev.audio):
                ev_times.setdefault(ev.sid, []).append(now)
    wall = time.perf_counter() - t_all0

    st = dict(srv.stats)      # snapshot BEFORE the overload phase below

    first_audio = [ts[0] - t_submit[sid] for sid, ts in ev_times.items()]
    first_wave = sorted(first_audio)[:slots]         # admitted round 1
    gaps = [g for ts in ev_times.values()
            for g in np.diff(ts)] or [0.0]

    def pct(xs, q):
        return round(1000 * float(np.percentile(xs, q)), 1)

    # overload: the HTTP front door (ServerRunner) sheds with 503s once
    # max_pending is exceeded.  A serial burst can never shed — each
    # open_stream RPC waits a scheduler round, which admits slots' worth —
    # so fire the burst from concurrent handler threads the way real
    # traffic arrives (the runner owns the batcher from here; shutdown
    # aborts the burst's sessions)
    import threading

    from text2speech_tpu.http_serve import ServerRunner

    runner = ServerRunner(srv, max_pending=slots)
    outcomes = []
    lock = threading.Lock()

    def burst_client(i):
        try:
            runner.open_stream(TEXTS[i % len(TEXTS)], seed=10_000 + i)
            ok = True
        except OverflowError:
            ok = False
        with lock:
            outcomes.append(ok)

    t_burst0 = time.perf_counter()
    threads = [threading.Thread(target=burst_client, args=(i,))
               for i in range(4 * slots)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    burst_s = time.perf_counter() - t_burst0
    runner.shutdown()
    shed = outcomes.count(False)
    overload = {"burst": 4 * slots, "burst_s": round(burst_s, 3),
                "accepted": outcomes.count(True), "shed": shed,
                "shed_rate": round(shed / (4 * slots), 3)}
    rounds = st["rounds"] - warm_stats["rounds"]
    emitted = st["emitted_samples"] - warm_stats["emitted_samples"]
    completed = st["completed"] - warm_stats["completed"]
    occ = (st["active_row_steps"] - warm_stats["active_row_steps"]) / max(
        st["row_steps"] - warm_stats["row_steps"], 1)
    far = (st["first_audio_rounds_sum"]
           - warm_stats["first_audio_rounds_sum"]) / max(completed, 1)

    # derived device-work bound for the SAME rounds: decode chunk_steps x
    # slots frames + vocode the emitted samples, at bench.py's measured
    # stage rates (what these rounds cost without the tunnel tax)
    dev_decode_s = rounds * chunk_steps * slots / decode_fps
    dev_vocode_s = emitted / vocoder_sps
    dev_bound_s = dev_decode_s + dev_vocode_s

    return {
        "metric": "server_samples_per_sec_measured",
        "value": round(emitted / wall, 1),
        "unit": "samples/sec",
        "vs_baseline": round(emitted / wall / 2_750_000.0, 3),
        "sessions_completed": completed,
        "slots": slots,
        "chunk_steps": chunk_steps,
        "rounds": rounds,
        "wall_s": round(wall, 2),
        "round_ms_median": round(1000 * float(np.median(round_s)), 1),
        "aggregate_rtf": round(emitted / wall / SR, 2),
        "slot_occupancy": round(occ, 3),
        "mean_first_audio_rounds": round(far, 2),
        # latency distributions (wall, tunnel tax included — divide by
        # tunnel_tax_factor for the TPU-local-host expectation)
        "first_audio_ms_p50": pct(first_audio, 50),
        "first_audio_ms_p95": pct(first_audio, 95),
        "first_audio_first_wave_ms_p50": pct(first_wave, 50),
        "first_audio_first_wave_ms_p95": pct(first_wave, 95),
        "inter_chunk_gap_ms_p50": pct(gaps, 50),
        "inter_chunk_gap_ms_p95": pct(gaps, 95),
        "queue_depth_p50": float(np.percentile(queue_depth, 50)),
        "queue_depth_max": int(max(queue_depth)),
        "overload": overload,
        "derived_device_bound_s": round(dev_bound_s, 2),
        "derived_device_samples_per_sec": round(emitted / dev_bound_s, 1),
        "tunnel_tax_factor": round(wall / dev_bound_s, 2),
        "note": "measured over the dev tunnel (~3 host round-trips/round); "
                "on a TPU-local host expect ~derived_device_samples_per_sec",
        "device": str(jax.devices()[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--chunk_steps", type=int, default=64)
    ap.add_argument("--n_requests", type=int, default=32)
    ap.add_argument("--max_steps", type=int, default=448,
                    help="per-session decode contract (the builder biases "
                         "the stop gate shut, so every session runs the "
                         "full contract — deterministic round count). "
                         "Must exceed the vocoder window (chunk + 2*ov = "
                         "262 frames at the full config) by a few chunks "
                         "or every session flushes in ONE emission and the "
                         "inter-chunk stats are degenerate (the r3 default "
                         "192 had exactly that problem)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 vocoder kernels (+ pair with "
                         "--quantized_decode for the full int8 chain)")
    ap.add_argument("--quantized_decode", action="store_true")
    ap.add_argument("--decode_fps", type=float, default=590_000.0,
                    help="bench.py-measured aggregate decode frames/s at "
                         "batch ~slots, for the derived device bound")
    ap.add_argument("--vocoder_sps", type=float, default=2_900_000.0,
                    help="bench.py-measured vocoder samples/s")
    args = ap.parse_args()
    print(json.dumps(run_serve_bench(
        slots=args.slots, chunk_steps=args.chunk_steps,
        n_requests=args.n_requests, max_steps=args.max_steps,
        int8=args.int8, quantized_decode=args.quantized_decode,
        decode_fps=args.decode_fps, vocoder_sps=args.vocoder_sps,
    )))


if __name__ == "__main__":
    main()
