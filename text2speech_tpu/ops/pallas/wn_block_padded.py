"""SUPERSEDED padded-layout WN-layer kernel family — test oracles only.

These are the round-2 padded-tile kernels (one zero tile of BT frames on each
side of the time axis; edge grid programs re-zero the pads each layer).  The
serving path moved to the unpadded streaming family in :mod:`.wn_block`
(no grid steps or HBM writes on pad tiles); this module is kept because the
padded kernels are structurally independent implementations of the same
coupling math, which makes them the oracle side of the
``tests/test_pallas.py`` parity ladder (padded vs unpadded, 3-tile halo vs
VMEM ring, in-kernel vs pre-materialized cond).

All coupling-body math comes from the shared helpers in :mod:`.wn_block`
(``_taps``, ``_gate_rs``, ``_store_layer_out``, ``_store_final_out``) — a fix
there fixes oracle and serving kernels together.

Design history and measured deltas: ``docs/KERNELS.md``.
Reference math: ``/root/reference/waveglow/glow.py:154-175``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .wn_block import (
    BT,
    _auto_interpret,
    _gate_rs,
    _incond,
    _store_final_out,
    _store_layer_out,
    _taps,
)


def _row_mask(out_tile, n_valid: int, n_prog: int, shape):
    """Padded-layout validity mask: real-frame index of row r in output
    tile j is (j-1)*BT + r (the first tile is padding).  None when every
    interior row is valid."""
    if n_valid >= (n_prog - 2) * BT:
        return None
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return ((out_tile - 1) * BT + rows) < n_valid


def pad_tiles(x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, C] -> [B, T + 2*BT, C] with zero tiles both sides (T % BT == 0)."""
    B, T, C = x.shape
    assert T % BT == 0
    z = jnp.zeros((B, BT, C), x.dtype)
    return jnp.concatenate([z, x, z], axis=1)


def unpad_tiles(x: jnp.ndarray) -> jnp.ndarray:
    return x[:, BT:-BT]


# ---------------------------------------------------------------------------
# Three-neighbor-tile kernels: the halo is read through BlockSpec tiles
# (t-1, t, t+1) of the padded array — 3x HBM reads of x, no VMEM ring.
# ---------------------------------------------------------------------------


def _kernel_padded(xm_ref, x0_ref, xp_ref, *refs, dilation: int, n_prog: int,
                   has_res: bool, n_valid: int, project_cond: bool):
    if project_cond:
        (spect_ref, w_in_ref, b_in_ref, w_cond_ref, b_cond_ref,
         w_rs_ref, b_rs_ref, acc_ref, x_out_ref, skip_out_ref) = refs
    else:
        (cond_ref, w_in_ref, b_in_ref, w_rs_ref, b_rs_ref,
         x_out_ref, skip_out_ref) = refs
        acc_ref = None
    t = pl.program_id(1)
    d = dilation
    is_pad = (t == 0) | (t == n_prog - 1)

    @pl.when(is_pad)
    def _():
        x_out_ref[...] = jnp.zeros_like(x_out_ref)
        skip_out_ref[...] = jnp.zeros_like(skip_out_ref)

    @pl.when(~is_pad)
    def _():
        w = w_in_ref[...]
        left = xm_ref[0, BT - d :, :]
        mid = x0_ref[0]
        right = xp_ref[0, :d, :]
        xwin = jnp.concatenate([left, mid, right], axis=0)
        cond = (
            _incond(spect_ref, w_cond_ref, b_cond_ref)
            if project_cond else cond_ref[0].astype(jnp.float32)
        )
        in_act = _taps(xwin, w, d) + b_in_ref[...] + cond
        rs = _gate_rs(in_act, w.dtype, w_rs_ref, b_rs_ref)
        vmask = _row_mask(t, n_valid, n_prog, (BT, 1))
        acc = None if acc_ref is None else acc_ref[0]
        _store_layer_out(x_out_ref, skip_out_ref, mid, rs, acc, vmask,
                         has_res)


def wn_layer_padded(
    xp: jnp.ndarray,       # [B, T + 2*BT, C], zero-padded tiles at both ends
    cond_p: jnp.ndarray,   # [B, T + 2*BT, 2C*n_cond] (layer `cond_index` used)
    w_in: jnp.ndarray,     # [3, C, 2C]
    b_in: jnp.ndarray,     # [2C] f32
    w_rs: jnp.ndarray,     # [C, 2C] or [C, C] (last layer)
    b_rs: jnp.ndarray,
    dilation: int,
    cond_index: int = 0,
    interpret: bool | None = None,
    n_valid: int | None = None,
):
    """One fused WN layer on padded layout -> (x_new padded, skip padded).

    ``cond_p`` may stack all layers' conditioning along channels; the
    BlockSpec index map selects this layer's 2C-slice."""
    interpret = _auto_interpret(interpret)
    B, Tp, C = xp.shape
    assert Tp % BT == 0 and Tp // BT >= 3, (Tp, BT)
    assert dilation <= BT
    assert cond_p.shape[-1] % (2 * C) == 0
    n_prog = Tp // BT
    has_res = w_rs.shape[-1] == 2 * C
    if n_valid is None:
        n_valid = Tp - 2 * BT

    kern = functools.partial(
        _kernel_padded, dilation=dilation, n_prog=n_prog, has_res=has_res,
        n_valid=n_valid, project_cond=False,
    )
    li = cond_index
    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_prog),
        in_specs=[
            # clamp the neighbor index at the edges; edge programs only write
            # zeros so the (duplicate) tile they read is irrelevant
            pl.BlockSpec((1, BT, C),
                         lambda b, t: (b, jnp.maximum(t - 1, 0), 0)),
            pl.BlockSpec((1, BT, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, BT, C),
                         lambda b, t, n=n_prog: (b, jnp.minimum(t + 1, n - 1), 0)),
            pl.BlockSpec((1, BT, 2 * C), lambda b, t: (b, t, li)),
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
            jax.ShapeDtypeStruct((B, Tp, C), xp.dtype),
            jax.ShapeDtypeStruct((B, Tp, C), xp.dtype),
        ],
        interpret=interpret,
    )(xp, xp, xp, cond_p, w_in, b_in, w_rs, b_rs)
    return x_out, skip_out


def wn_layer_spect(
    xp: jnp.ndarray,        # [B, Tp, C] padded hidden
    spect_p: jnp.ndarray,   # [B, Tp, M] padded grouped mel (M = n_mel*n_group)
    w_in: jnp.ndarray,      # [3, C, 2C]
    b_in: jnp.ndarray,      # [2C] f32
    w_cond: jnp.ndarray,    # [M, 2C]
    b_cond: jnp.ndarray,    # [2C] f32
    w_rs: jnp.ndarray,      # [C, 2C] or [C, C]
    b_rs: jnp.ndarray,
    skip_acc: jnp.ndarray,  # [B, Tp, C] running skip sum (donated)
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
):
    """Fused WN layer with in-kernel conditioning projection and in-place
    skip accumulation -> (x_new padded, skip_acc + skip)."""
    interpret = _auto_interpret(interpret)
    B, Tp, C = xp.shape
    M = spect_p.shape[-1]
    assert Tp % BT == 0 and Tp // BT >= 3 and dilation <= BT
    n_prog = Tp // BT
    has_res = w_rs.shape[-1] == 2 * C
    if n_valid is None:
        n_valid = Tp - 2 * BT

    kern = functools.partial(
        _kernel_padded, dilation=dilation, n_prog=n_prog, has_res=has_res,
        n_valid=n_valid, project_cond=True,
    )
    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_prog),
        in_specs=[
            pl.BlockSpec((1, BT, C),
                         lambda b, t: (b, jnp.maximum(t - 1, 0), 0)),
            pl.BlockSpec((1, BT, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, BT, C),
                         lambda b, t, n=n_prog: (b, jnp.minimum(t + 1, n - 1), 0)),
            pl.BlockSpec((1, BT, M), lambda b, t: (b, t, 0)),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((M, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec(w_rs.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(b_rs.shape, lambda b, t: (0,)),
            pl.BlockSpec((1, BT, C), lambda b, t: (b, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, BT, C), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, C), xp.dtype),
            jax.ShapeDtypeStruct((B, Tp, C), xp.dtype),
        ],
        input_output_aliases={10: 1},
        interpret=interpret,
    )(xp, xp, xp, spect_p, w_in, b_in, w_cond, b_cond, w_rs, b_rs, skip_acc)
    return x_out, skip_out


# ---------------------------------------------------------------------------
# Padded streaming-ring kernels: one extra grid step; each step reads ONE
# x tile and computes the PREVIOUS tile's output from a 2-tile VMEM ring
# (1x HBM reads of x) — still spends grid steps re-zeroing the pad tiles.
# ---------------------------------------------------------------------------


def _ring_window_padded(ring, x0_ref, t, d: int):
    """Padded-layout ring window: no zero-init, no lookahead mask — the pad
    tiles supply the edge zeros."""
    prev1 = ring[t % 2]        # tile t-1
    prev2 = ring[(t + 1) % 2]  # tile t-2
    left = prev2[BT - d :, :]
    right = x0_ref[0, :d, :]
    return prev1, jnp.concatenate([left, prev1, right], axis=0)


def _kernel_stream(x0_ref, *refs, dilation: int, n_prog: int, has_res: bool,
                   n_valid: int, final: bool):
    if final:
        (spect_ref, w_in_ref, b_in_ref, w_cond_ref, b_cond_ref,
         w_rs_ref, b_rs_ref, acc_ref, w_end_ref, b_end_ref,
         wn_out_ref, ring) = refs
    else:
        (spect_ref, w_in_ref, b_in_ref, w_cond_ref, b_cond_ref,
         w_rs_ref, b_rs_ref, acc_ref, x_out_ref, skip_out_ref, ring) = refs
    t = pl.program_id(1)
    j = t - 1                      # output tile index
    is_pad_out = (j <= 0) | (j >= n_prog - 1)

    @pl.when((t >= 1) & is_pad_out)
    def _():
        if final:
            wn_out_ref[...] = jnp.zeros_like(wn_out_ref)
        else:
            x_out_ref[...] = jnp.zeros_like(x_out_ref)
            skip_out_ref[...] = jnp.zeros_like(skip_out_ref)

    @pl.when((t >= 1) & ~is_pad_out)
    def _():
        w = w_in_ref[...]
        mid, xwin = _ring_window_padded(ring, x0_ref, t, dilation)
        cond = _incond(spect_ref, w_cond_ref, b_cond_ref)
        in_act = _taps(xwin, w, dilation) + b_in_ref[...] + cond
        rs = _gate_rs(in_act, w.dtype, w_rs_ref, b_rs_ref)
        if final:
            _store_final_out(wn_out_ref, rs, acc_ref[0], w_end_ref,
                             b_end_ref, w.dtype)
        else:
            vmask = _row_mask(j, n_valid, n_prog, (BT, 1))
            _store_layer_out(x_out_ref, skip_out_ref, mid, rs, acc_ref[0],
                             vmask, has_res)

    @pl.when(t <= n_prog - 1)
    def _():
        ring[(t + 1) % 2] = x0_ref[0]


def _stream_specs(n_prog, C, M, w_rs_shape, b_rs_shape):
    def out_idx(b, t, n=n_prog):
        return (b, jnp.clip(t - 1, 0, n - 1), 0)

    return out_idx, [
        pl.BlockSpec((1, BT, C),
                     lambda b, t, n=n_prog: (b, jnp.minimum(t, n - 1), 0)),
        pl.BlockSpec((1, BT, M), out_idx),
        pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
        pl.BlockSpec((2 * C,), lambda b, t: (0,)),
        pl.BlockSpec((M, 2 * C), lambda b, t: (0, 0)),
        pl.BlockSpec((2 * C,), lambda b, t: (0,)),
        pl.BlockSpec(w_rs_shape, lambda b, t: (0, 0)),
        pl.BlockSpec(b_rs_shape, lambda b, t: (0,)),
        pl.BlockSpec((1, BT, C), out_idx),
    ]


def wn_layer_stream(
    xp: jnp.ndarray,
    spect_p: jnp.ndarray,
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    w_cond: jnp.ndarray,
    b_cond: jnp.ndarray,
    w_rs: jnp.ndarray,
    b_rs: jnp.ndarray,
    skip_acc: jnp.ndarray,
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
):
    """Padded streaming fused WN layer (single-read x) — same contract as
    :func:`wn_layer_spect`."""
    interpret = _auto_interpret(interpret)
    B, Tp, C = xp.shape
    M = spect_p.shape[-1]
    assert Tp % BT == 0 and Tp // BT >= 3 and dilation <= BT
    n_prog = Tp // BT
    has_res = w_rs.shape[-1] == 2 * C
    if n_valid is None:
        n_valid = Tp - 2 * BT

    kern = functools.partial(
        _kernel_stream, dilation=dilation, n_prog=n_prog, has_res=has_res,
        n_valid=n_valid, final=False,
    )
    from jax.experimental.pallas import tpu as pltpu

    out_idx, in_specs = _stream_specs(n_prog, C, M, w_rs.shape, b_rs.shape)
    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_prog + 1),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, BT, C), out_idx),
            pl.BlockSpec((1, BT, C), out_idx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, C), xp.dtype),
            jax.ShapeDtypeStruct((B, Tp, C), xp.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, C), xp.dtype)],
        input_output_aliases={8: 1},
        interpret=interpret,
    )(xp, spect_p, w_in, b_in, w_cond, b_cond, w_rs, b_rs, skip_acc)
    return x_out, skip_out


def wn_layer_stream_final(
    xp: jnp.ndarray,        # [B, Tp, C] padded hidden (last layer input)
    spect_p: jnp.ndarray,   # [B, Tp, M]
    w_in: jnp.ndarray,      # [3, C, 2C]
    b_in: jnp.ndarray,      # [2C] f32
    w_cond: jnp.ndarray,    # [M, 2C]
    b_cond: jnp.ndarray,    # [2C] f32
    w_rs: jnp.ndarray,      # [C, C]  (last layer: skip only)
    b_rs: jnp.ndarray,      # [C] f32
    skip_acc: jnp.ndarray,  # [B, Tp, C] running skip sum
    w_end: jnp.ndarray,     # [C, E] (E = 2 * n_half)
    b_end: jnp.ndarray,     # [E] f32
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """Padded streaming final WN layer + folded end projection -> wn_out
    [B, Tp, E] f32 (= (b, log_s) coupling terms)."""
    interpret = _auto_interpret(interpret)
    B, Tp, C = xp.shape
    M = spect_p.shape[-1]
    E = w_end.shape[-1]
    assert Tp % BT == 0 and Tp // BT >= 3 and dilation <= BT
    assert w_rs.shape[-1] == C, "final layer emits skip only"
    n_prog = Tp // BT
    if n_valid is None:
        n_valid = Tp - 2 * BT

    kern = functools.partial(
        _kernel_stream, dilation=dilation, n_prog=n_prog, has_res=False,
        n_valid=n_valid, final=True,
    )
    from jax.experimental.pallas import tpu as pltpu

    out_idx, in_specs = _stream_specs(n_prog, C, M, w_rs.shape, b_rs.shape)
    in_specs = in_specs + [
        pl.BlockSpec((C, E), lambda b, t: (0, 0)),
        pl.BlockSpec((E,), lambda b, t: (0,)),
    ]
    (wn_out,) = pl.pallas_call(
        kern,
        grid=(B, n_prog + 1),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, BT, E), out_idx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, E), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, C), xp.dtype)],
        interpret=interpret,
    )(xp, spect_p, w_in, b_in, w_cond, b_cond, w_rs, b_rs, skip_acc,
      w_end, b_end)
    return wn_out
