#!/usr/bin/env python
"""Measure the Pallas WN-conv BACKWARD probe against XLA's conv backward
(VERDICT r3 #8: close the training-efficiency question with a measurement,
not arithmetic).

Three programs at the reference WN shape (C=512, 2C=1024, T=2048 group-
space frames, k=3 dilated SAME conv), timed by CHAINED iteration
differencing (CLAUDE.md gotcha #3: one jit runs N data-dependent
iterations of the unit; T(N2) - T(N1) over N2-N1 iterations cancels the
tunnel dispatch — plain B-vs-4B scaling put ~2 ms of work against
±100 ms of tunnel jitter and returned noise):

  fwd     — the shipping ``lax.conv_general_dilated`` training lowering
  xla bwd — jax.vjp of the same (XLA's own conv backward: the baseline)
  pallas  — ``conv_k3_bwd_pallas`` (transposed taps for dL/dx, dL/dW
            accumulated across grid steps in VMEM)

The backward chains carry the COTANGENT (``g *= 1 + 1e-12·Σdw`` each
iteration): dL/dx does not depend on x, so feeding dx back would leave
it loop-invariant and XLA would hoist it.  Dilations sweep the WN ladder
(1, 8, 64, 128).  Prints one JSON line; the verdict goes to
``docs/KERNELS.md``.
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
B0 = 8
N1, N2 = 8, 40      # chained iteration counts; diff = 32 units


def _time_chained(run_short, run_long, n_units, repeats=5):
    """Median of T(N2)-T(N1) over the extra iterations, scalar-blocked."""
    for fn in (run_short, run_long):
        float(fn())
    diffs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_short())
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_long())
        tl = time.perf_counter() - t0
        diffs.append(tl - ts)
    return max(float(np.median(diffs)), 1e-9) / n_units


def probe(dilation: int, dtype=jnp.bfloat16) -> dict:
    rng = np.random.RandomState(dilation)
    x = jnp.asarray(rng.randn(B0, T, C), dtype)
    g = jnp.asarray(rng.randn(B0, T, 2 * C), dtype)
    w = jnp.asarray(0.05 * rng.randn(3, C, 2 * C), dtype)
    x_pad = pad_tiles(x)
    g_pad = pad_tiles(g)

    def chain_fwd(n):
        @jax.jit
        def run(x0, w_):
            def body(_, c):
                xc, acc = c
                y = conv_k3_fwd_xla(xc, w_, dilation)
                s = jnp.sum(y.astype(jnp.float32))
                return xc * (1 + 1e-12 * s).astype(dtype), acc + s
            _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
            return acc
        return run

    def chain_xla_bwd(n):
        @jax.jit
        def run(x0, g0, w_):
            def body(_, c):
                gc, acc = c
                _, vjp = jax.vjp(
                    lambda a, b_: conv_k3_fwd_xla(a, b_, dilation), x0, w_)
                dx, dw = vjp(gc)
                s = (jnp.sum(dx.astype(jnp.float32))
                     + jnp.sum(dw.astype(jnp.float32)))
                return gc * (1 + 1e-12 * s).astype(dtype), acc + s
            _, acc = jax.lax.fori_loop(0, n, body, (g0, jnp.float32(0)))
            return acc
        return run

    def chain_pallas_bwd(n):
        @jax.jit
        def run(xp, gp, w_):
            def body(_, c):
                gc, acc = c
                dx, dw = conv_k3_bwd_pallas(xp, gc, w_, dilation)
                s = jnp.sum(dx.astype(jnp.float32)) + jnp.sum(dw)
                return gc * (1 + 1e-12 * s).astype(dtype), acc + s
            _, acc = jax.lax.fori_loop(0, n, body, (gp, jnp.float32(0)))
            return acc
        return run

    jax.block_until_ready((x, g, w, x_pad, g_pad))
    n = N2 - N1
    fs, fl = chain_fwd(N1), chain_fwd(N2)
    s_fwd = _time_chained(lambda: fs(x, w), lambda: fl(x, w), n)
    xs, xl = chain_xla_bwd(N1), chain_xla_bwd(N2)
    s_xla = _time_chained(lambda: xs(x, g, w), lambda: xl(x, g, w), n)
    ps, plg = chain_pallas_bwd(N1), chain_pallas_bwd(N2)
    s_pal = _time_chained(lambda: ps(x_pad, g_pad, w),
                          lambda: plg(x_pad, g_pad, w), n)

    # FLOPs per iteration: fwd 3 matmuls [B0*T, C]x[C, 2C]; bwd = 2x that
    # (dx transposed taps + dW outer products); the xla-bwd chain also
    # runs the forward inside vjp, subtracted out below
    f_unit = 2 * 3 * B0 * T * C * 2 * C
    bwd_xla = max(s_xla - s_fwd, 1e-12)     # vjp chain = fwd + bwd
    bwd_pal = s_pal                          # backward only by construction
    return {
        "dilation": dilation,
        "fwd_tflops": round(f_unit / s_fwd / 1e12, 1),
        "bwd_xla_tflops": round(2 * f_unit / bwd_xla / 1e12, 1),
        "bwd_pallas_tflops": round(2 * f_unit / bwd_pal / 1e12, 1),
        "pallas_vs_xla_bwd": round(bwd_xla / bwd_pal, 3),
    }


def main():
    out = {"shape": f"B{B0} T{T} C{C} bf16 (BT={BT}), "
                    f"chained {N1}->{N2} iterations",
           "probes": [probe(d) for d in (1, 8, 64, 128)]}
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
