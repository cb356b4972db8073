"""Fused WN-layer Pallas kernel, BlockSpec-only variant.

Same math as :mod:`.wn_layer` (dilated k=3 conv + cond + gated tanh·σ +
res/skip matmul, ``/root/reference/waveglow/glow.py:154-175``) but the halo is
read through *three neighboring BlockSpec tiles* of a BT-padded array instead
of manual DMA — no ``ANY`` memory space, no ``make_async_copy``, so it lowers
through the ordinary Mosaic pipeline (the manual-DMA variant crashes this
rig's remote compiler; see CLAUDE.md).

Layout contract: x and cond are padded by one tile (BT) of zeros on both
sides of the time axis; outputs are produced in the same padded layout so an
entire 8-layer WN block runs padded with ONE pad at block entry:

    xp   : [B, T + 2*BT, C]
    cond : [B, T + 2*BT, 2C]
    out  : (x_new padded, skip padded)

Grid (B, T//BT + 2): edge programs write zero tiles (keeping the padding
invariant for the next layer); interior programs see tiles (t-1, t, t+1) and
compute on the centered window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BT = 512


def _row_mask(out_tile, n_valid: int, n_prog: int, shape):
    """Static-shape validity mask for a partial final tile.

    Real-frame index of row r in output tile j is (j-1)*BT + r (the first
    tile is padding).  Returns None when every interior row is valid (exact
    tile multiple) so the common case compiles with no masking at all.
    """
    if n_valid >= (n_prog - 2) * BT:
        return None
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return ((out_tile - 1) * BT + rows) < n_valid


def _mask_rows(val, mask):
    return val if mask is None else jnp.where(mask, val, jnp.zeros_like(val))


def _kernel(xm_ref, x0_ref, xp_ref, cond_ref, w_in_ref, b_in_ref,
            w_rs_ref, b_rs_ref, x_out_ref, skip_out_ref, *,
            dilation: int, n_prog: int, has_res: bool, n_valid: int):
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
        # centered window via static slices of the three neighbor tiles
        left = xm_ref[0, BT - d :, :]               # [d, C]
        mid = x0_ref[0]                              # [BT, C]
        right = xp_ref[0, :d, :]                     # [d, C]
        xwin = jnp.concatenate([left, mid, right], axis=0)  # [BT + 2d, C]
        in_act = (
            jnp.dot(xwin[0:BT], w[0], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[d : d + BT], w[1], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[2 * d : 2 * d + BT], w[2],
                      preferred_element_type=jnp.float32)
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
        # zero rows past the real sequence end so bias-driven activations in
        # the rounding pad never leak into the tail through the next layer's
        # halo reads (reference convs implicitly zero-pad, glow.py:136-137)
        vmask = _row_mask(t, n_valid, n_prog, (BT, 1))
        if has_res:
            x_out_ref[0] = _mask_rows(
                (mid.astype(jnp.float32) + rs[:, :C]).astype(x_out_ref.dtype),
                vmask,
            )
            skip_out_ref[0] = rs[:, C:].astype(skip_out_ref.dtype)
        else:
            x_out_ref[0] = _mask_rows(mid, vmask)
            skip_out_ref[0] = rs.astype(skip_out_ref.dtype)


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

    ``cond_p`` may stack all layers' conditioning along channels (the fused
    cond projection); ``cond_index`` selects this layer's 2C-slice via the
    BlockSpec index map — no sliced-operand copies.
    """
    if interpret is None:  # auto-interpret off-TPU (CPU tests)
        interpret = jax.default_backend() != "tpu"
    B, Tp, C = xp.shape
    assert Tp % BT == 0 and Tp // BT >= 3, (Tp, BT)
    assert dilation <= BT
    assert cond_p.shape[-1] % (2 * C) == 0
    n_prog = Tp // BT
    has_res = w_rs.shape[-1] == 2 * C
    if n_valid is None:
        n_valid = Tp - 2 * BT

    kern = functools.partial(
        _kernel, dilation=dilation, n_prog=n_prog, has_res=has_res,
        n_valid=n_valid,
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


def pad_tiles(x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, C] -> [B, T + 2*BT, C] with zero tiles both sides (T % BT == 0)."""
    B, T, C = x.shape
    assert T % BT == 0
    z = jnp.zeros((B, BT, C), x.dtype)
    return jnp.concatenate([z, x, z], axis=1)


def unpad_tiles(x: jnp.ndarray) -> jnp.ndarray:
    return x[:, BT:-BT]


def _kernel_spect(xm_ref, x0_ref, xp_ref, spect_ref, w_in_ref, b_in_ref,
                  w_cond_ref, b_cond_ref, w_rs_ref, b_rs_ref, acc_ref,
                  x_out_ref, skip_out_ref, *,
                  dilation: int, n_prog: int, has_res: bool, n_valid: int):
    """Variant computing the conditioning projection in-kernel (the 2C cond
    term is spect_tile @ w_cond — no materialized cond_all) and accumulating
    the skip sum in place (acc aliases skip_out)."""
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
            jnp.dot(spect_ref[0], w_cond_ref[...],
                    preferred_element_type=jnp.float32)
            + b_cond_ref[...]
        )
        in_act = (
            jnp.dot(xwin[0:BT], w[0], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[d : d + BT], w[1], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[2 * d : 2 * d + BT], w[2],
                      preferred_element_type=jnp.float32)
            + b_in_ref[...]
            + cond
        )
        C = in_act.shape[-1] // 2
        acts = (jnp.tanh(in_act[:, :C]) * jax.nn.sigmoid(in_act[:, C:])).astype(
            w.dtype
        )
        rs = (
            jnp.dot(acts, w_rs_ref[...], preferred_element_type=jnp.float32)
            + b_rs_ref[...]
        )
        acc = acc_ref[0]
        vmask = _row_mask(t, n_valid, n_prog, (BT, 1))
        if has_res:
            x_out_ref[0] = _mask_rows(
                (mid.astype(jnp.float32) + rs[:, :C]).astype(x_out_ref.dtype),
                vmask,
            )
            skip_out_ref[0] = (acc + rs[:, C:].astype(acc.dtype))
        else:
            x_out_ref[0] = _mask_rows(mid, vmask)
            skip_out_ref[0] = (acc + rs.astype(acc.dtype))


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
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Tp, C = xp.shape
    M = spect_p.shape[-1]
    assert Tp % BT == 0 and Tp // BT >= 3 and dilation <= BT
    n_prog = Tp // BT
    has_res = w_rs.shape[-1] == 2 * C
    if n_valid is None:
        n_valid = Tp - 2 * BT

    kern = functools.partial(
        _kernel_spect, dilation=dilation, n_prog=n_prog, has_res=has_res,
        n_valid=n_valid,
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


def _kernel_stream(x0_ref, spect_ref, w_in_ref, b_in_ref,
                   w_cond_ref, b_cond_ref, w_rs_ref, b_rs_ref, acc_ref,
                   x_out_ref, skip_out_ref, ring, *,
                   dilation: int, n_prog: int, has_res: bool, n_valid: int):
    """Streaming variant: grid has one extra step; each step reads ONE x tile
    and computes the PREVIOUS tile's output from a 2-tile VMEM ring (tiles
    t-2, t-1 in scratch + first d rows of tile t) — 1x HBM reads of x
    instead of 3x neighbor-tile reads."""
    t = pl.program_id(1)
    d = dilation
    j = t - 1                      # output tile index
    is_pad_out = (j <= 0) | (j >= n_prog - 1)

    @pl.when((t >= 1) & is_pad_out)
    def _():
        x_out_ref[...] = jnp.zeros_like(x_out_ref)
        skip_out_ref[...] = jnp.zeros_like(skip_out_ref)

    @pl.when((t >= 1) & ~is_pad_out)
    def _():
        w = w_in_ref[...]
        # store at step s puts tile s in slot (s+1)%2, so before this step's
        # store: tile t-1 is in slot t%2, tile t-2 in slot (t+1)%2
        prev1 = ring[t % 2]        # tile t-1
        prev2 = ring[(t + 1) % 2]  # tile t-2
        left = prev2[BT - d :, :]
        mid = prev1
        right = x0_ref[0, :d, :]
        xwin = jnp.concatenate([left, mid, right], axis=0)
        cond = (
            jnp.dot(spect_ref[0], w_cond_ref[...],
                    preferred_element_type=jnp.float32)
            + b_cond_ref[...]
        )
        in_act = (
            jnp.dot(xwin[0:BT], w[0], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[d : d + BT], w[1], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[2 * d : 2 * d + BT], w[2],
                      preferred_element_type=jnp.float32)
            + b_in_ref[...]
            + cond
        )
        C = in_act.shape[-1] // 2
        acts = (jnp.tanh(in_act[:, :C]) * jax.nn.sigmoid(in_act[:, C:])).astype(
            w.dtype
        )
        rs = (
            jnp.dot(acts, w_rs_ref[...], preferred_element_type=jnp.float32)
            + b_rs_ref[...]
        )
        acc = acc_ref[0]
        vmask = _row_mask(j, n_valid, n_prog, (BT, 1))
        if has_res:
            x_out_ref[0] = _mask_rows(
                (mid.astype(jnp.float32) + rs[:, :C]).astype(x_out_ref.dtype),
                vmask,
            )
            skip_out_ref[0] = acc + rs[:, C:].astype(acc.dtype)
        else:
            x_out_ref[0] = _mask_rows(mid, vmask)
            skip_out_ref[0] = acc + rs.astype(acc.dtype)

    # store the current tile into the ring for the next two steps
    @pl.when(t <= n_prog - 1)
    def _():
        ring[(t + 1) % 2] = x0_ref[0]


def _row_mask_np(out_tile, n_valid: int, n_tiles: int, shape):
    """Unpadded-layout validity mask: real frame index of row r in output
    tile j is j*BT + r."""
    if n_valid >= n_tiles * BT:
        return None
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (out_tile * BT + rows) < n_valid


def _kernel_stream2(x0_ref, spect_ref, w_in_ref, b_in_ref,
                    w_cond_ref, b_cond_ref, w_rs_ref, b_rs_ref, acc_ref,
                    x_out_ref, skip_out_ref, ring, *,
                    dilation: int, n_tiles: int, has_res: bool, n_valid: int):
    """Streaming WN layer on the UNPADDED layout: no zero pad tiles, so no
    grid steps are spent writing them (7% of the grid at 26 real tiles).
    Left halo: ring slot 0 is zero-initialized at t=0 (the conv's implicit
    zero padding, glow.py:136-137).  Right halo: the lookahead tile is
    clamped at the last tile, so the final output tile selects zeros
    instead."""
    t = pl.program_id(1)
    d = dilation
    j = t - 1

    @pl.when(t == 0)
    def _():
        ring[0] = jnp.zeros_like(ring[0])

    @pl.when(t >= 1)
    def _():
        w = w_in_ref[...]
        prev1 = ring[t % 2]        # tile j
        prev2 = ring[(t + 1) % 2]  # tile j-1 (zeros when j == 0)
        left = prev2[BT - d :, :]
        mid = prev1
        # lookahead tile j+1; at the last output tile the index map clamps
        # to tile j itself — mask to the zero padding the conv semantics need
        right = jnp.where(j < n_tiles - 1, x0_ref[0, :d, :], 0)
        xwin = jnp.concatenate([left, mid, right], axis=0)
        cond = (
            jnp.dot(spect_ref[0], w_cond_ref[...],
                    preferred_element_type=jnp.float32)
            + b_cond_ref[...]
        )
        in_act = (
            jnp.dot(xwin[0:BT], w[0], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[d : d + BT], w[1], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[2 * d : 2 * d + BT], w[2],
                      preferred_element_type=jnp.float32)
            + b_in_ref[...]
            + cond
        )
        C = in_act.shape[-1] // 2
        acts = (jnp.tanh(in_act[:, :C]) * jax.nn.sigmoid(in_act[:, C:])).astype(
            w.dtype
        )
        rs = (
            jnp.dot(acts, w_rs_ref[...], preferred_element_type=jnp.float32)
            + b_rs_ref[...]
        )
        acc = acc_ref[0]
        vmask = _row_mask_np(j, n_valid, n_tiles, (BT, 1))
        if has_res:
            x_out_ref[0] = _mask_rows(
                (mid.astype(jnp.float32) + rs[:, :C]).astype(x_out_ref.dtype),
                vmask,
            )
            skip_out_ref[0] = acc + rs[:, C:].astype(acc.dtype)
        else:
            x_out_ref[0] = _mask_rows(mid, vmask)
            skip_out_ref[0] = acc + rs.astype(acc.dtype)

    @pl.when(t <= n_tiles - 1)
    def _():
        ring[(t + 1) % 2] = x0_ref[0]


def wn_layer_stream2(
    x: jnp.ndarray,         # [B, T, C] hidden, T % BT == 0, NO pad tiles
    spect: jnp.ndarray,     # [B, T, M]
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    w_cond: jnp.ndarray,
    b_cond: jnp.ndarray,
    w_rs: jnp.ndarray,
    b_rs: jnp.ndarray,
    skip_acc: jnp.ndarray,  # [B, T, C]
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
):
    """Unpadded streaming fused WN layer -> (x_new, skip_acc + skip)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, C = x.shape
    M = spect.shape[-1]
    assert T % BT == 0 and dilation <= BT
    n_tiles = T // BT
    has_res = w_rs.shape[-1] == 2 * C
    if n_valid is None:
        n_valid = T

    def out_idx(b, t, n=n_tiles):
        return (b, jnp.clip(t - 1, 0, n - 1), 0)

    kern = functools.partial(
        _kernel_stream2, dilation=dilation, n_tiles=n_tiles, has_res=has_res,
        n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C),
                         lambda b, t, n=n_tiles: (b, jnp.minimum(t, n - 1), 0)),
            pl.BlockSpec((1, BT, M), out_idx),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((M, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec(w_rs.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(b_rs.shape, lambda b, t: (0,)),
            pl.BlockSpec((1, BT, C), out_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), out_idx),
            pl.BlockSpec((1, BT, C), out_idx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, C), x.dtype)],
        input_output_aliases={8: 1},
        interpret=interpret,
    )(x, spect, w_in, b_in, w_cond, b_cond, w_rs, b_rs, skip_acc)
    return x_out, skip_out


def _kernel_stream2_first(x0_ref, spect_ref, wp_in_ref, b_in_ref, b_edge_ref,
                          w_cond_ref, b_cond_ref, w_rs_ref, b_rs_ref,
                          start_k_ref, start_b_ref,
                          x_out_ref, skip_out_ref, ring, *,
                          dilation: int, n_tiles: int, n_valid: int):
    """First WN layer: its hidden input is ``xh = x0 @ start + b_s`` with
    rank <= n_half (the audio half has 2-4 channels, glow.py:118-121), so
    the three K=C dilated taps collapse into K=n_half taps COMPOSED onto x0
    (w'_t = start_k @ w_in[t]) — ~8 of the 21 MXU passes of a standard
    layer disappear, and the x input shrinks from [T, C] to [T, n_half].

    Bias bookkeeping: the standard kernels see zero xh in the halo beyond
    the sequence, so the folded per-tap bias b_s @ w_t must be suppressed
    where that tap reads out-of-range rows: b_in_ref carries
    b_in + b_s @ (w_0 + w_1 + w_2) and b_edge_ref carries
    [b_s @ w_0, b_s @ w_2] to subtract at the d edge rows.  The skip
    accumulator starts at zero here, so there is no acc input."""
    t = pl.program_id(1)
    d = dilation
    j = t - 1

    @pl.when(t == 0)
    def _():
        ring[0] = jnp.zeros_like(ring[0])

    @pl.when(t >= 1)
    def _():
        wp = wp_in_ref[...]                       # [3, n_half, 2C] composed
        prev1 = ring[t % 2]                       # x0 tile j
        prev2 = ring[(t + 1) % 2]
        left = prev2[BT - d :, :]
        mid = prev1
        right = jnp.where(j < n_tiles - 1, x0_ref[0, :d, :], 0)
        xwin = jnp.concatenate([left, mid, right], axis=0)
        cond = (
            jnp.dot(spect_ref[0], w_cond_ref[...],
                    preferred_element_type=jnp.float32)
            + b_cond_ref[...]
        )
        in_act = (
            jnp.dot(xwin[0:BT], wp[0], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[d : d + BT], wp[1],
                      preferred_element_type=jnp.float32)
            + jnp.dot(xwin[2 * d : 2 * d + BT], wp[2],
                      preferred_element_type=jnp.float32)
            + b_in_ref[...]
            + cond
        )
        # suppress the folded start-bias where a tap read beyond the
        # sequence (left tap at rows < d of row 0; right tap at rows
        # >= n_valid - d)
        rows = j * BT + jax.lax.broadcasted_iota(jnp.int32, (BT, 1), 0)
        b_edge = b_edge_ref[...]
        in_act = in_act - jnp.where(rows < d, b_edge[0], 0.0)
        in_act = in_act - jnp.where(rows >= n_valid - d, b_edge[1], 0.0)
        C = in_act.shape[-1] // 2
        acts = (jnp.tanh(in_act[:, :C]) * jax.nn.sigmoid(in_act[:, C:])).astype(
            wp.dtype
        )
        rs = (
            jnp.dot(acts, w_rs_ref[...], preferred_element_type=jnp.float32)
            + b_rs_ref[...]
        )
        # hidden state for the residual output, computed in-kernel (K=n_half)
        xh = (
            jnp.dot(mid, start_k_ref[...], preferred_element_type=jnp.float32)
            + start_b_ref[...]
        )
        vmask = _row_mask_np(j, n_valid, n_tiles, (BT, 1))
        x_out_ref[0] = _mask_rows(
            (xh + rs[:, :C]).astype(x_out_ref.dtype), vmask
        )
        skip_out_ref[0] = rs[:, C:].astype(skip_out_ref.dtype)

    @pl.when(t <= n_tiles - 1)
    def _():
        ring[(t + 1) % 2] = x0_ref[0]


def wn_layer_stream2_first(
    x0: jnp.ndarray,        # [B, T, n_half] audio half (NOT the hidden state)
    spect: jnp.ndarray,     # [B, T, M]
    start_k: jnp.ndarray,   # [n_half, C] folded start kernel
    start_b: jnp.ndarray,   # [C] f32
    w_in: jnp.ndarray,      # [3, C, 2C] layer-0 dilated conv
    b_in: jnp.ndarray,      # [2C] f32
    w_cond: jnp.ndarray,    # [M, 2C]
    b_cond: jnp.ndarray,    # [2C] f32
    w_rs: jnp.ndarray,      # [C, 2C]
    b_rs: jnp.ndarray,      # [2C] f32
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
):
    """Fused start projection + first WN layer -> (x_hidden, skip).
    Equivalent to ``wn_layer_stream2(x0 @ start_k + start_b, ...)`` with a
    zero skip accumulator, at n_half-rank tap cost."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, n_half = x0.shape
    M = spect.shape[-1]
    C = start_k.shape[-1]
    assert T % BT == 0 and dilation <= BT
    assert w_rs.shape[-1] == 2 * C
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T

    f32 = jnp.float32
    wp = jnp.einsum("nc,tco->tno", start_k.astype(f32), w_in.astype(f32))
    tap_bias = jnp.einsum("c,tco->to", start_b.astype(f32), w_in.astype(f32))
    b_all = b_in.astype(f32) + tap_bias.sum(axis=0)
    b_edge = jnp.stack([tap_bias[0], tap_bias[2]])      # [2, 2C]

    def out_idx(b, t, n=n_tiles):
        return (b, jnp.clip(t - 1, 0, n - 1), 0)

    kern = functools.partial(
        _kernel_stream2_first, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, n_half),
                         lambda b, t, n=n_tiles: (b, jnp.minimum(t, n - 1), 0)),
            pl.BlockSpec((1, BT, M), out_idx),
            pl.BlockSpec((3, n_half, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((2, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((M, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((C, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((n_half, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), out_idx),
            pl.BlockSpec((1, BT, C), out_idx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), spect.dtype),
            jax.ShapeDtypeStruct((B, T, C), spect.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, n_half), x0.dtype)],
        interpret=interpret,
    )(x0, spect, wp.astype(x0.dtype), b_all, b_edge,
      w_cond, b_cond, w_rs, b_rs, start_k, start_b.astype(f32))
    return x_out, skip_out


def _kernel_stream2_final(x0_ref, spect_ref, w_in_ref, b_in_ref,
                          w_cond_ref, b_cond_ref, w_rs_ref, b_rs_ref, acc_ref,
                          w_end_ref, b_end_ref, wn_out_ref, ring, *,
                          dilation: int, n_tiles: int, n_valid: int):
    """Unpadded streaming final layer + folded end projection."""
    t = pl.program_id(1)
    d = dilation
    j = t - 1

    @pl.when(t == 0)
    def _():
        ring[0] = jnp.zeros_like(ring[0])

    @pl.when(t >= 1)
    def _():
        w = w_in_ref[...]
        prev1 = ring[t % 2]
        prev2 = ring[(t + 1) % 2]
        left = prev2[BT - d :, :]
        mid = prev1
        right = jnp.where(j < n_tiles - 1, x0_ref[0, :d, :], 0)
        xwin = jnp.concatenate([left, mid, right], axis=0)
        cond = (
            jnp.dot(spect_ref[0], w_cond_ref[...],
                    preferred_element_type=jnp.float32)
            + b_cond_ref[...]
        )
        in_act = (
            jnp.dot(xwin[0:BT], w[0], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[d : d + BT], w[1], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[2 * d : 2 * d + BT], w[2],
                      preferred_element_type=jnp.float32)
            + b_in_ref[...]
            + cond
        )
        C = in_act.shape[-1] // 2
        acts = (jnp.tanh(in_act[:, :C]) * jax.nn.sigmoid(in_act[:, C:])).astype(
            w.dtype
        )
        rs = (
            jnp.dot(acts, w_rs_ref[...], preferred_element_type=jnp.float32)
            + b_rs_ref[...]
        )
        skip = acc_ref[0].astype(jnp.float32) + rs
        wn_out_ref[0] = (
            jnp.dot(skip.astype(w.dtype), w_end_ref[...],
                    preferred_element_type=jnp.float32)
            + b_end_ref[...]
        )

    @pl.when(t <= n_tiles - 1)
    def _():
        ring[(t + 1) % 2] = x0_ref[0]


def wn_layer_stream2_final(
    x: jnp.ndarray,
    spect: jnp.ndarray,
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    w_cond: jnp.ndarray,
    b_cond: jnp.ndarray,
    w_rs: jnp.ndarray,      # [C, C]
    b_rs: jnp.ndarray,
    skip_acc: jnp.ndarray,
    w_end: jnp.ndarray,     # [C, E]
    b_end: jnp.ndarray,
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """Unpadded streaming final WN layer + end projection -> wn_out
    [B, T, E] f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, C = x.shape
    M = spect.shape[-1]
    E = w_end.shape[-1]
    assert T % BT == 0 and dilation <= BT
    assert w_rs.shape[-1] == C
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T

    def out_idx(b, t, n=n_tiles):
        return (b, jnp.clip(t - 1, 0, n - 1), 0)

    kern = functools.partial(
        _kernel_stream2_final, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    (wn_out,) = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C),
                         lambda b, t, n=n_tiles: (b, jnp.minimum(t, n - 1), 0)),
            pl.BlockSpec((1, BT, M), out_idx),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((M, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((C, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((1, BT, C), out_idx),
            pl.BlockSpec((C, E), lambda b, t: (0, 0)),
            pl.BlockSpec((E,), lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, E), out_idx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, E), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, C), x.dtype)],
        interpret=interpret,
    )(x, spect, w_in, b_in, w_cond, b_cond, w_rs, b_rs, skip_acc,
      w_end, b_end)
    return wn_out


def _kernel_stream_final(x0_ref, spect_ref, w_in_ref, b_in_ref,
                         w_cond_ref, b_cond_ref, w_rs_ref, b_rs_ref, acc_ref,
                         w_end_ref, b_end_ref, wn_out_ref, ring, *,
                         dilation: int, n_prog: int, n_valid: int):
    """Final WN layer with the end projection folded in
    (``glow.py:166-175``'s ``end`` conv): emits (log_s, b) coupling terms
    directly — the hidden-state and skip-sum tiles of the last layer never
    round-trip through HBM.  Tail rows past ``n_valid`` carry bias-driven
    values exactly like the unfused path's masked epilogue; callers zero them
    via the tile mask."""
    t = pl.program_id(1)
    d = dilation
    j = t - 1
    is_pad_out = (j <= 0) | (j >= n_prog - 1)

    @pl.when((t >= 1) & is_pad_out)
    def _():
        wn_out_ref[...] = jnp.zeros_like(wn_out_ref)

    @pl.when((t >= 1) & ~is_pad_out)
    def _():
        w = w_in_ref[...]
        prev1 = ring[t % 2]
        prev2 = ring[(t + 1) % 2]
        left = prev2[BT - d :, :]
        mid = prev1
        right = x0_ref[0, :d, :]
        xwin = jnp.concatenate([left, mid, right], axis=0)
        cond = (
            jnp.dot(spect_ref[0], w_cond_ref[...],
                    preferred_element_type=jnp.float32)
            + b_cond_ref[...]
        )
        in_act = (
            jnp.dot(xwin[0:BT], w[0], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[d : d + BT], w[1], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[2 * d : 2 * d + BT], w[2],
                      preferred_element_type=jnp.float32)
            + b_in_ref[...]
            + cond
        )
        C = in_act.shape[-1] // 2
        acts = (jnp.tanh(in_act[:, :C]) * jax.nn.sigmoid(in_act[:, C:])).astype(
            w.dtype
        )
        rs = (
            jnp.dot(acts, w_rs_ref[...], preferred_element_type=jnp.float32)
            + b_rs_ref[...]
        )
        skip = acc_ref[0].astype(jnp.float32) + rs     # [BT, C] f32
        wn_out_ref[0] = (
            jnp.dot(skip.astype(w.dtype), w_end_ref[...],
                    preferred_element_type=jnp.float32)
            + b_end_ref[...]
        )

    @pl.when(t <= n_prog - 1)
    def _():
        ring[(t + 1) % 2] = x0_ref[0]


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
    """Streaming final WN layer + folded end projection -> wn_out
    [B, Tp, E] f32 (= (b, log_s) coupling terms)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Tp, C = xp.shape
    M = spect_p.shape[-1]
    E = w_end.shape[-1]
    assert Tp % BT == 0 and Tp // BT >= 3 and dilation <= BT
    assert w_rs.shape[-1] == C, "final layer emits skip only"
    n_prog = Tp // BT
    if n_valid is None:
        n_valid = Tp - 2 * BT

    def out_idx(b, t, n=n_prog):
        return (b, jnp.clip(t - 1, 0, n - 1), 0)

    kern = functools.partial(
        _kernel_stream_final, dilation=dilation, n_prog=n_prog, n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    (wn_out,) = pl.pallas_call(
        kern,
        grid=(B, n_prog + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C),
                         lambda b, t, n=n_prog: (b, jnp.minimum(t, n - 1), 0)),
            pl.BlockSpec((1, BT, M), out_idx),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((M, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((C, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((1, BT, C), out_idx),
            pl.BlockSpec((C, E), lambda b, t: (0, 0)),
            pl.BlockSpec((E,), lambda b, t: (0,)),
        ],
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
    """Streaming fused WN layer (single-read x) — same contract as
    :func:`wn_layer_spect`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Tp, C = xp.shape
    M = spect_p.shape[-1]
    assert Tp % BT == 0 and Tp // BT >= 3 and dilation <= BT
    n_prog = Tp // BT
    has_res = w_rs.shape[-1] == 2 * C
    if n_valid is None:
        n_valid = Tp - 2 * BT

    def out_idx(b, t, n=n_prog):
        return (b, jnp.clip(t - 1, 0, n - 1), 0)

    kern = functools.partial(
        _kernel_stream, dilation=dilation, n_prog=n_prog, has_res=has_res,
        n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_prog + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C),
                         lambda b, t, n=n_prog: (b, jnp.minimum(t, n - 1), 0)),
            pl.BlockSpec((1, BT, M), out_idx),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((M, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec(w_rs.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(b_rs.shape, lambda b, t: (0,)),
            pl.BlockSpec((1, BT, C), out_idx),
        ],
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


# ---------------------------------------------------------------------------
# Direct-conditioning variants: the caller materializes cond_all
# [B, T, 2C*L] (composed at MEL level — see models/waveglow_fused.py
# compose_cond: upsample∘grouping∘cond collapse to K=4*n_mel per-phase
# weights, half the conditioning FLOPs of the in-kernel K=640 projection)
# and each layer's kernel reads its 2C slice through the BlockSpec index
# map instead of projecting the grouped spect in-kernel.
# ---------------------------------------------------------------------------


def _kernel_stream2_dcond(x0_ref, cond_ref, w_in_ref, b_in_ref,
                          w_rs_ref, b_rs_ref, acc_ref,
                          x_out_ref, skip_out_ref, ring, *,
                          dilation: int, n_tiles: int, has_res: bool,
                          n_valid: int):
    t = pl.program_id(1)
    d = dilation
    j = t - 1

    @pl.when(t == 0)
    def _():
        ring[0] = jnp.zeros_like(ring[0])

    @pl.when(t >= 1)
    def _():
        w = w_in_ref[...]
        prev1 = ring[t % 2]
        prev2 = ring[(t + 1) % 2]
        left = prev2[BT - d :, :]
        mid = prev1
        right = jnp.where(j < n_tiles - 1, x0_ref[0, :d, :], 0)
        xwin = jnp.concatenate([left, mid, right], axis=0)
        in_act = (
            jnp.dot(xwin[0:BT], w[0], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[d : d + BT], w[1], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[2 * d : 2 * d + BT], w[2],
                      preferred_element_type=jnp.float32)
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
        acc = acc_ref[0]
        vmask = _row_mask_np(j, n_valid, n_tiles, (BT, 1))
        if has_res:
            x_out_ref[0] = _mask_rows(
                (mid.astype(jnp.float32) + rs[:, :C]).astype(x_out_ref.dtype),
                vmask,
            )
            skip_out_ref[0] = acc + rs[:, C:].astype(acc.dtype)
        else:
            x_out_ref[0] = _mask_rows(mid, vmask)
            skip_out_ref[0] = acc + rs.astype(acc.dtype)

    @pl.when(t <= n_tiles - 1)
    def _():
        ring[(t + 1) % 2] = x0_ref[0]


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
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, C = x.shape
    assert T % BT == 0 and dilation <= BT
    assert cond_all.shape[-1] % (2 * C) == 0
    n_tiles = T // BT
    has_res = w_rs.shape[-1] == 2 * C
    if n_valid is None:
        n_valid = T
    li = cond_index

    def out_idx(b, t, n=n_tiles):
        return (b, jnp.clip(t - 1, 0, n - 1), 0)

    kern = functools.partial(
        _kernel_stream2_dcond, dilation=dilation, n_tiles=n_tiles,
        has_res=has_res, n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C),
                         lambda b, t, n=n_tiles: (b, jnp.minimum(t, n - 1), 0)),
            pl.BlockSpec((1, BT, 2 * C),
                         lambda b, t, n=n_tiles: (b, jnp.clip(t - 1, 0, n - 1), li)),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec(w_rs.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(b_rs.shape, lambda b, t: (0,)),
            pl.BlockSpec((1, BT, C), out_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), out_idx),
            pl.BlockSpec((1, BT, C), out_idx),
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


def _kernel_stream2_first_dcond(x0_ref, cond_ref, wp_in_ref, b_in_ref,
                                b_edge_ref, w_rs_ref, b_rs_ref,
                                start_k_ref, start_b_ref,
                                x_out_ref, skip_out_ref, ring, *,
                                dilation: int, n_tiles: int, n_valid: int):
    t = pl.program_id(1)
    d = dilation
    j = t - 1

    @pl.when(t == 0)
    def _():
        ring[0] = jnp.zeros_like(ring[0])

    @pl.when(t >= 1)
    def _():
        wp = wp_in_ref[...]
        prev1 = ring[t % 2]
        prev2 = ring[(t + 1) % 2]
        left = prev2[BT - d :, :]
        mid = prev1
        right = jnp.where(j < n_tiles - 1, x0_ref[0, :d, :], 0)
        xwin = jnp.concatenate([left, mid, right], axis=0)
        in_act = (
            jnp.dot(xwin[0:BT], wp[0], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[d : d + BT], wp[1],
                      preferred_element_type=jnp.float32)
            + jnp.dot(xwin[2 * d : 2 * d + BT], wp[2],
                      preferred_element_type=jnp.float32)
            + b_in_ref[...]
            + cond_ref[0].astype(jnp.float32)
        )
        rows = j * BT + jax.lax.broadcasted_iota(jnp.int32, (BT, 1), 0)
        b_edge = b_edge_ref[...]
        in_act = in_act - jnp.where(rows < d, b_edge[0], 0.0)
        in_act = in_act - jnp.where(rows >= n_valid - d, b_edge[1], 0.0)
        C = in_act.shape[-1] // 2
        acts = (jnp.tanh(in_act[:, :C]) * jax.nn.sigmoid(in_act[:, C:])).astype(
            wp.dtype
        )
        rs = (
            jnp.dot(acts, w_rs_ref[...], preferred_element_type=jnp.float32)
            + b_rs_ref[...]
        )
        xh = (
            jnp.dot(mid, start_k_ref[...], preferred_element_type=jnp.float32)
            + start_b_ref[...]
        )
        vmask = _row_mask_np(j, n_valid, n_tiles, (BT, 1))
        x_out_ref[0] = _mask_rows(
            (xh + rs[:, :C]).astype(x_out_ref.dtype), vmask
        )
        skip_out_ref[0] = rs[:, C:].astype(skip_out_ref.dtype)

    @pl.when(t <= n_tiles - 1)
    def _():
        ring[(t + 1) % 2] = x0_ref[0]


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
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, n_half = x0.shape
    C = start_k.shape[-1]
    assert T % BT == 0 and dilation <= BT
    assert w_rs.shape[-1] == 2 * C
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T

    f32 = jnp.float32
    wp = jnp.einsum("nc,tco->tno", start_k.astype(f32), w_in.astype(f32))
    tap_bias = jnp.einsum("c,tco->to", start_b.astype(f32), w_in.astype(f32))
    b_all = b_in.astype(f32) + tap_bias.sum(axis=0)
    b_edge = jnp.stack([tap_bias[0], tap_bias[2]])

    def out_idx(b, t, n=n_tiles):
        return (b, jnp.clip(t - 1, 0, n - 1), 0)

    kern = functools.partial(
        _kernel_stream2_first_dcond, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, n_half),
                         lambda b, t, n=n_tiles: (b, jnp.minimum(t, n - 1), 0)),
            pl.BlockSpec((1, BT, 2 * C), out_idx),
            pl.BlockSpec((3, n_half, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((2, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((C, 2 * C), lambda b, t: (0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((n_half, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), out_idx),
            pl.BlockSpec((1, BT, C), out_idx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), cond_all.dtype),
            jax.ShapeDtypeStruct((B, T, C), cond_all.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, n_half), x0.dtype)],
        interpret=interpret,
    )(x0, cond_all, wp.astype(x0.dtype), b_all, b_edge,
      w_rs, b_rs, start_k, start_b.astype(f32))
    return x_out, skip_out


def _kernel_stream2_final_dcond(x0_ref, cond_ref, w_in_ref, b_in_ref,
                                w_rs_ref, b_rs_ref, acc_ref,
                                w_end_ref, b_end_ref, wn_out_ref, ring, *,
                                dilation: int, n_tiles: int, n_valid: int):
    t = pl.program_id(1)
    d = dilation
    j = t - 1

    @pl.when(t == 0)
    def _():
        ring[0] = jnp.zeros_like(ring[0])

    @pl.when(t >= 1)
    def _():
        w = w_in_ref[...]
        prev1 = ring[t % 2]
        prev2 = ring[(t + 1) % 2]
        left = prev2[BT - d :, :]
        mid = prev1
        right = jnp.where(j < n_tiles - 1, x0_ref[0, :d, :], 0)
        xwin = jnp.concatenate([left, mid, right], axis=0)
        in_act = (
            jnp.dot(xwin[0:BT], w[0], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[d : d + BT], w[1], preferred_element_type=jnp.float32)
            + jnp.dot(xwin[2 * d : 2 * d + BT], w[2],
                      preferred_element_type=jnp.float32)
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
        skip = acc_ref[0].astype(jnp.float32) + rs
        wn_out_ref[0] = (
            jnp.dot(skip.astype(w.dtype), w_end_ref[...],
                    preferred_element_type=jnp.float32)
            + b_end_ref[...]
        )

    @pl.when(t <= n_tiles - 1)
    def _():
        ring[(t + 1) % 2] = x0_ref[0]


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
) -> jnp.ndarray:
    """Final layer + folded end projection with pre-materialized cond."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, C = x.shape
    E = w_end.shape[-1]
    assert T % BT == 0 and dilation <= BT
    assert w_rs.shape[-1] == C
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T
    li = cond_index

    def out_idx(b, t, n=n_tiles):
        return (b, jnp.clip(t - 1, 0, n - 1), 0)

    kern = functools.partial(
        _kernel_stream2_final_dcond, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    (wn_out,) = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C),
                         lambda b, t, n=n_tiles: (b, jnp.minimum(t, n - 1), 0)),
            pl.BlockSpec((1, BT, 2 * C),
                         lambda b, t, n=n_tiles: (b, jnp.clip(t - 1, 0, n - 1), li)),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((C, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((1, BT, C), out_idx),
            pl.BlockSpec((C, E), lambda b, t: (0, 0)),
            pl.BlockSpec((E,), lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, E), out_idx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, E), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, C), x.dtype)],
        interpret=interpret,
    )(x, cond_all, w_in, b_in, w_rs, b_rs, skip_acc, w_end, b_end)
    return wn_out
