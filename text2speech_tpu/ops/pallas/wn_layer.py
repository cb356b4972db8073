"""Fused WaveGlow WN-layer Pallas kernel (experimental, opt-in).

One WN coupling layer = dilated conv (k=3) + conditioning add + gated tanh·σ
+ res/skip 1x1 conv + residual add (``/root/reference/waveglow/glow.py:154-175``).
XLA keeps the two matmuls as separate kernels with the activations bouncing
through HBM; this kernel keeps the whole layer in VMEM per time-tile:

    scratch <- DMA x[start-d : start+BT+d]      (halo, edge tiles zero-fill)
    in_act   = Σ_j scratch[jd : jd+BT] @ w_in[j] + b_in + cond_tile
    acts     = tanh(in_act[:, :C]) * σ(in_act[:, C:])
    rs       = acts @ w_rs + b_rs
    x_out    = x_tile + rs[:, :C]; skip_out = rs[:, C:]   (last layer: skip=rs)

Forward-only (inference serving path); training uses the XLA composite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

BT = 512  # time-tile


def _kernel(x_hbm, cond_ref, w_in_ref, b_in_ref, w_rs_ref, b_rs_ref,
            x_out_ref, skip_out_ref, scratch, sem, *, dilation: int,
            n_tiles: int, has_res: bool):
    d = dilation
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = t * BT

    # halo window [start-d, start+BT+d) with zero-filled edges
    @pl.when(t == 0)
    def _():
        scratch[0:d] = jnp.zeros_like(scratch[0:d])
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, BT + d), :], scratch.at[pl.ds(d, BT + d)], sem
        )
        dma.start()
        dma.wait()

    @pl.when((t > 0) & (t < n_tiles - 1))
    def _():
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(start - d, BT + 2 * d), :], scratch, sem
        )
        dma.start()
        dma.wait()

    @pl.when(t == n_tiles - 1)
    def _():
        scratch[BT + d:] = jnp.zeros_like(scratch[BT + d:])
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(start - d, BT + d), :], scratch.at[pl.ds(0, BT + d)], sem
        )
        dma.start()
        dma.wait()

    w = w_in_ref[...]
    in_act = (
        jnp.dot(scratch[0:BT], w[0], preferred_element_type=jnp.float32)
        + jnp.dot(scratch[d : d + BT], w[1], preferred_element_type=jnp.float32)
        + jnp.dot(scratch[2 * d : 2 * d + BT], w[2], preferred_element_type=jnp.float32)
        + b_in_ref[...]
        + cond_ref[0].astype(jnp.float32)
    )
    C = in_act.shape[-1] // 2
    acts = (jnp.tanh(in_act[:, :C]) * jax.nn.sigmoid(in_act[:, C:])).astype(
        w.dtype
    )
    rs = (
        jnp.dot(acts, w_rs_ref[...], preferred_element_type=jnp.float32)
        + b_rs_ref[...]
    )
    if has_res:
        x_out_ref[0] = (scratch[d : d + BT].astype(jnp.float32) + rs[:, :C]).astype(
            x_out_ref.dtype
        )
        skip_out_ref[0] = rs[:, C:].astype(skip_out_ref.dtype)
    else:
        x_out_ref[0] = scratch[d : d + BT]
        skip_out_ref[0] = rs.astype(skip_out_ref.dtype)


def wn_layer_fused(
    x: jnp.ndarray,        # [B, T, C] (T % BT == 0)
    cond: jnp.ndarray,     # [B, T, 2C]
    w_in: jnp.ndarray,     # [3, C, 2C]
    b_in: jnp.ndarray,     # [2C]
    w_rs: jnp.ndarray,     # [C, 2C] (res+skip) or [C, C] (last layer)
    b_rs: jnp.ndarray,
    dilation: int,
    interpret: bool = False,
):
    """Returns (x_new [B,T,C], skip [B,T,C])."""
    B, T, C = x.shape
    assert T % BT == 0 and T // BT >= 2, (T, BT)
    has_res = w_rs.shape[-1] == 2 * C
    n_tiles = T // BT

    kern = functools.partial(
        _kernel, dilation=dilation, n_tiles=n_tiles, has_res=has_res
    )
    grid = (B, n_tiles)
    x_out, skip_out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, T, C), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec((1, BT, 2 * C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec(w_rs.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(b_rs.shape, lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, BT, C), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT + 2 * dilation, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, cond, w_in, b_in, w_rs, b_rs)
    return x_out, skip_out


def wn_layer_reference(x, cond, w_in, b_in, w_rs, b_rs, dilation):
    """XLA composite of the same math (for parity tests + perf baseline)."""
    d = dilation
    B, T, C = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
    in_act = (
        jnp.einsum("btc,co->bto", xp[:, : T], w_in[0],
                   preferred_element_type=jnp.float32)
        + jnp.einsum("btc,co->bto", x, w_in[1],
                     preferred_element_type=jnp.float32)
        + jnp.einsum("btc,co->bto", xp[:, 2 * d :], w_in[2],
                     preferred_element_type=jnp.float32)
        + b_in
        + cond.astype(jnp.float32)
    )
    C2 = in_act.shape[-1] // 2
    acts = (jnp.tanh(in_act[..., :C2]) * jax.nn.sigmoid(in_act[..., C2:])).astype(x.dtype)
    rs = jnp.einsum("btc,co->bto", acts, w_rs,
                    preferred_element_type=jnp.float32) + b_rs
    if w_rs.shape[-1] == 2 * C:
        return (x.astype(jnp.float32) + rs[..., :C]).astype(x.dtype), rs[..., C:].astype(x.dtype)
    return x, rs.astype(x.dtype)
