"""Direct-conditioning (dcond) WN kernel flavors — quarantined opt-in.

The caller materializes ``cond_all`` [B, T, 2C*L] (composed at MEL level —
see ``models/waveglow_fused.py`` ``precompute_composed_cond``) and each
layer's kernel reads its 2C slice through the BlockSpec index map instead of
projecting the grouped spect in-kernel.  Measured SLOWER end-to-end than the
in-kernel projection at reference size (2.647M vs 2.875M samples/s — the
[B,T,8192] cond materialization plus streaming the phase-expanded weights
costs more HBM bandwidth than the MXU time it saves; CLAUDE.md round-3
notes).  Kept as a tested opt-in for configs where the trade flips (small L,
short T); the shipping path is the in-kernel family in :mod:`.wn_block`.

Same reference math (``/root/reference/waveglow/glow.py:154-175``); all
coupling-body helpers are imported from :mod:`.wn_block` so the math exists
exactly once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .wn_block import (
    BT,
    _auto_interpret,
    _fold_first_taps,
    _in_idx,
    _kernel_stream2,
    _kernel_stream2_final,
    _kernel_stream2_first,
    _out_idx,
)

def _cond_slice_idx(n_tiles: int, cond_index: int):
    return lambda b, t, n=n_tiles, li=cond_index: (
        b, jnp.clip(t - 1, 0, n - 1), li
    )


def wn_layer_stream2_dcond(
    x: jnp.ndarray,          # [B, T, C]
    cond_all: jnp.ndarray,   # [B, T, 2C*L]; slice cond_index used
    cond_index: int,
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    w_rs: jnp.ndarray,
    b_rs: jnp.ndarray,
    skip_acc: jnp.ndarray,
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
):
    """Unpadded streaming WN layer with pre-materialized conditioning."""
    interpret = _auto_interpret(interpret)
    B, T, C = x.shape
    assert T % BT == 0 and dilation <= BT
    assert cond_all.shape[-1] % (2 * C) == 0
    n_tiles = T // BT
    has_res = w_rs.shape[-1] == 2 * C
    if n_valid is None:
        n_valid = T

    kern = functools.partial(
        _kernel_stream2, dilation=dilation, n_tiles=n_tiles,
        has_res=has_res, n_valid=n_valid, project_cond=False,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, 2 * C), _cond_slice_idx(n_tiles, cond_index)),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec(w_rs.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(b_rs.shape, lambda b, t: (0,)),
            pl.BlockSpec((1, BT, C), oi),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), oi),
            pl.BlockSpec((1, BT, C), oi),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, C), x.dtype)],
        input_output_aliases={6: 1},
        interpret=interpret,
    )(x, cond_all, w_in, b_in, w_rs, b_rs, skip_acc)
    return x_out, skip_out


def wn_layer_stream2_first_dcond(
    x0: jnp.ndarray,         # [B, T, n_half]
    cond_all: jnp.ndarray,   # [B, T, 2C*L]; slice 0 used
    start_k: jnp.ndarray,
    start_b: jnp.ndarray,
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    w_rs: jnp.ndarray,
    b_rs: jnp.ndarray,
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
):
    """Fused start + first layer with pre-materialized conditioning."""
    interpret = _auto_interpret(interpret)
    B, T, n_half = x0.shape
    C = start_k.shape[-1]
    assert T % BT == 0 and dilation <= BT
    assert w_rs.shape[-1] == 2 * C
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T

    wp, b_extra, b_edge = _fold_first_taps(start_k, start_b, w_in)
    b_all = b_in.astype(jnp.float32) + b_extra

    kern = functools.partial(
        _kernel_stream2_first, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid, project_cond=False,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, n_half), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, 2 * C), _cond_slice_idx(n_tiles, 0)),
            pl.BlockSpec((3, n_half, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((2, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((C, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((n_half, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), oi),
            pl.BlockSpec((1, BT, C), oi),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), cond_all.dtype),
            jax.ShapeDtypeStruct((B, T, C), cond_all.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, n_half), x0.dtype)],
        interpret=interpret,
    )(x0, cond_all, wp.astype(x0.dtype), b_all, b_edge,
      w_rs, b_rs, start_k, start_b.astype(jnp.float32))
    return x_out, skip_out


def wn_layer_stream2_final_dcond(
    x: jnp.ndarray,
    cond_all: jnp.ndarray,   # [B, T, 2C*L]; slice cond_index used
    cond_index: int,
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    w_rs: jnp.ndarray,       # [C, C]
    b_rs: jnp.ndarray,
    skip_acc: jnp.ndarray,
    w_end: jnp.ndarray,
    b_end: jnp.ndarray,
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
    fold_rs: bool = True,
) -> jnp.ndarray:
    """Final layer + folded end projection with pre-materialized cond."""
    interpret = _auto_interpret(interpret)
    B, T, C = x.shape
    E = w_end.shape[-1]
    assert T % BT == 0 and dilation <= BT
    assert w_rs.shape[-1] == C
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T

    if fold_rs:
        f32 = jnp.float32
        w_rs_eff = (w_rs.astype(f32) @ w_end.astype(f32)).astype(w_rs.dtype)
        b_end_eff = b_rs.astype(f32) @ w_end.astype(f32) + b_end.astype(f32)
        b_rs_eff = jnp.zeros((1,), f32)
    else:
        w_rs_eff, b_rs_eff, b_end_eff = w_rs, b_rs, b_end

    kern = functools.partial(
        _kernel_stream2_final, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid, project_cond=False, fold_rs=fold_rs,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    (wn_out,) = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, 2 * C), _cond_slice_idx(n_tiles, cond_index)),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec(w_rs_eff.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(b_rs_eff.shape, lambda b, t: (0,)),
            pl.BlockSpec((1, BT, C), oi),
            pl.BlockSpec((C, E), lambda b, t: (0, 0)),
            pl.BlockSpec((E,), lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, E), oi),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, E), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, C), x.dtype)],
        interpret=interpret,
    )(x, cond_all, w_in, b_in, w_rs_eff, b_rs_eff, skip_acc, w_end,
      b_end_eff)
    return wn_out
