#!/usr/bin/env python
"""Measure the Pallas WN-conv BACKWARD probe against XLA's conv backward
(VERDICT r3 #8: close the training-efficiency question with a measurement,
not arithmetic).

Three programs at the reference WN shape (C=512, 2C=1024, T=2048 group-
space frames, k=3 dilated SAME conv), batch-scaled (B vs 4B diffs with
scalar readback — tunnel-honest like bench.py):

  fwd        — the shipping ``lax.conv_general_dilated`` training lowering
  fwd+bwd    — jax.vjp of the same (XLA's own conv backward: the baseline)
  fwd+pallas — identical forward + ``conv_k3_bwd_pallas`` (transposed taps
               for dL/dx, dL/dW accumulated across grid steps in VMEM)

The forward is IDENTICAL in the last two, so (fwd+bwd) - fwd vs
(fwd+pallas) - fwd is a clean backward-vs-backward comparison.  Dilations
sweep the WN ladder (1, 8, 64, 128).  Prints one JSON line; the verdict
goes to ``docs/KERNELS.md``.
"""

from __future__ import annotations

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

from text2speech_tpu.ops.pallas.wn_backward import (conv_k3_bwd_pallas,
                                                    conv_k3_fwd_xla)
from text2speech_tpu.ops.pallas.wn_block import BT
from text2speech_tpu.ops.pallas.wn_block_padded import pad_tiles

C = 512
T = 2048            # reference segment 16000 / n_group 8, tile-rounded
B0 = 3              # reference train batch


def _time_scaled(fn, args_small, args_big, scale_items, repeats=7):
    for args in (args_small, args_big):
        float(fn(*args))
    diffs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args_small))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(*args_big))
        tb = time.perf_counter() - t0
        diffs.append(tb - ts)
    return max(float(np.median(diffs)), 1e-9) / scale_items


def probe(dilation: int, dtype=jnp.bfloat16) -> dict:
    rng = np.random.RandomState(dilation)

    def make(b):
        x = jnp.asarray(rng.randn(b, T, C), dtype)
        g = jnp.asarray(rng.randn(b, T, 2 * C), dtype)
        return x, g

    w = jnp.asarray(0.05 * rng.randn(3, C, 2 * C), dtype)

    fwd = jax.jit(lambda x, w_: jnp.sum(
        conv_k3_fwd_xla(x, w_, dilation).astype(jnp.float32)))

    @jax.jit
    def fwd_bwd_xla(x, g, w_):
        _, vjp = jax.vjp(lambda a, b_: conv_k3_fwd_xla(a, b_, dilation), x, w_)
        dx, dw = vjp(g)
        return (jnp.sum(dx.astype(jnp.float32))
                + jnp.sum(dw.astype(jnp.float32)))

    @jax.jit
    def fwd_bwd_pallas(x, g, w_):
        y = conv_k3_fwd_xla(x, w_, dilation)      # identical forward
        dx, dw = conv_k3_bwd_pallas(pad_tiles(x), pad_tiles(g), w_, dilation)
        return (jnp.sum(y.astype(jnp.float32)) * 0.0
                + jnp.sum(dx.astype(jnp.float32)) + jnp.sum(dw))

    x1, g1 = make(B0)
    x4, g4 = make(4 * B0)
    jax.block_until_ready((x1, g1, x4, g4, w))
    n = 3 * B0

    s_fwd = _time_scaled(lambda x: fwd(x, w), (x1,), (x4,), n)
    s_xla = _time_scaled(lambda x, g: fwd_bwd_xla(x, g, w),
                         (x1, g1), (x4, g4), n)
    s_pal = _time_scaled(lambda x, g: fwd_bwd_pallas(x, g, w),
                         (x1, g1), (x4, g4), n)

    # FLOPs per batch item: fwd 3 matmuls T x C x 2C; bwd dx same, dW same
    f_unit = 2 * 3 * T * C * 2 * C
    bwd_xla = max(s_xla - s_fwd, 1e-12)
    bwd_pal = max(s_pal - s_fwd, 1e-12)
    return {
        "dilation": dilation,
        "fwd_tflops": round(f_unit / s_fwd / 1e12, 1),
        "bwd_xla_tflops": round(2 * f_unit / bwd_xla / 1e12, 1),
        "bwd_pallas_tflops": round(2 * f_unit / bwd_pal / 1e12, 1),
        "pallas_vs_xla_bwd": round(bwd_xla / bwd_pal, 3),
    }


def main():
    out = {"shape": f"B{B0} T{T} C{C} bf16 (BT={BT})",
           "probes": [probe(d) for d in (1, 8, 64, 128)]}
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
