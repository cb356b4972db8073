"""Fused WN-layer Pallas kernels — unpadded streaming family (serving path).

Same math as the reference WN layer (dilated k=3 conv + cond + gated tanh·σ +
res/skip matmul, ``/root/reference/waveglow/glow.py:154-175``), fused into one
VMEM pass per layer.  The UNPADDED tile layout spends no grid steps or HBM
writes on zero pad tiles: the conv's implicit edge zero-padding
(``glow.py:136-137``) is synthesized in-kernel — ring slot 0 is
zero-initialized for the left halo, the lookahead tile is masked at the right
edge.  Each hidden tile is read from HBM exactly once through a 2-tile VMEM
ring persisting across grid steps.

Kernel roles (this module carries only the SHIPPING in-kernel-cond flavors;
the pre-materialized-cond twins live in :mod:`.wn_block_dcond`, a measured-
slower opt-in, selected by the static ``project_cond`` flag on the shared
kernel bodies):

* standard layer  — res/skip outputs, in-place skip accumulation
  (``wn_layer_stream2``);
* first layer     — start projection folded into the taps at rank n_half
  (``wn_layer_stream2_first``);
* final layer     — end projection folded in, emits the (b, log_s) coupling
  terms directly (``wn_layer_stream2_final``).

The shared coupling-body math lives in the module-level helpers (``_taps``,
``_gate_rs``, ``_store_layer_out``, …) used by every kernel — including the
superseded padded-layout family quarantined in :mod:`.wn_block_padded`
(kept as test oracles) — so a fix to the coupling math is one edit.

The earlier manual-DMA variant (ANY memory space + ``make_async_copy`` halos)
crashed this rig's remote Mosaic compiler and was removed; see
``docs/KERNELS.md`` for the full design ladder with measured deltas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BT = 512


# ---------------------------------------------------------------------------
# Shared coupling body.  ALL kernels (including the padded oracles in
# wn_block_padded.py) express the WN layer through these helpers; the math
# exists exactly once.
# ---------------------------------------------------------------------------


def _mask_rows(val, mask):
    return val if mask is None else jnp.where(mask, val, jnp.zeros_like(val))


def _row_mask_np(out_tile, n_valid: int, n_tiles: int, shape):
    """Unpadded-layout validity mask: real frame index of row r in output
    tile j is j*BT + r.  None when every row is valid (no masking compiled)."""
    if n_valid >= n_tiles * BT:
        return None
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (out_tile * BT + rows) < n_valid


def _taps(xwin, w, d: int, n_rows: int = BT):
    """Three dilated conv taps as matmuls over the haloed window
    [n_rows + 2d, C] -> [n_rows, 2C] f32 (MXU accumulates in f32)."""
    return (
        jnp.dot(xwin[0:n_rows], w[0], preferred_element_type=jnp.float32)
        + jnp.dot(xwin[d : d + n_rows], w[1],
                  preferred_element_type=jnp.float32)
        + jnp.dot(xwin[2 * d : 2 * d + n_rows], w[2],
                  preferred_element_type=jnp.float32)
    )


def _incond(spect_ref, w_cond_ref, b_cond_ref):
    """In-kernel conditioning projection: spect_tile @ w_cond + b (f32)."""
    return (
        jnp.dot(spect_ref[0], w_cond_ref[...],
                preferred_element_type=jnp.float32)
        + b_cond_ref[...]
    )


def _gate(in_act, dtype):
    """Gated tanh·σ over the stacked [.., 2C] pre-activation -> [.., C].
    Elementwise math stays f32 (Mosaic bf16 sigmoid bug, CLAUDE.md #8);
    the result is cast to the weight dtype for the MXU."""
    C = in_act.shape[-1] // 2
    return (jnp.tanh(in_act[:, :C]) * jax.nn.sigmoid(in_act[:, C:])).astype(
        dtype
    )


def _gate_rs(in_act, dtype, w_rs_ref, b_rs_ref):
    """Gated activation + res/skip matmul (+bias) -> rs [BT, rs_out] f32."""
    return (
        jnp.dot(_gate(in_act, dtype), w_rs_ref[...],
                preferred_element_type=jnp.float32)
        + b_rs_ref[...]
    )


def _store_layer_out(x_out_ref, skip_out_ref, res_base, rs, acc, vmask,
                     has_res: bool):
    """Masked res/skip epilogue.  ``res_base`` is the residual input (the
    hidden tile — or the in-kernel start projection for the first layer);
    ``acc`` is the running skip sum tile or None (first layer / no
    accumulator).  Rows past ``n_valid`` are zeroed so bias-driven
    activations in the rounding pad never leak through the next layer's
    halo reads."""
    if has_res:
        C = x_out_ref.shape[-1]
        x_out_ref[0] = _mask_rows(
            (res_base.astype(jnp.float32) + rs[:, :C]).astype(x_out_ref.dtype),
            vmask,
        )
        skip = rs[:, C:]
    else:
        x_out_ref[0] = _mask_rows(res_base, vmask)
        skip = rs
    if acc is None:
        skip_out_ref[0] = skip.astype(skip_out_ref.dtype)
    else:
        skip_out_ref[0] = acc + skip.astype(acc.dtype)


def _store_final_out(wn_out_ref, rs, acc, w_end_ref, b_end_ref, dtype):
    """Folded end projection epilogue: (skip_acc + rs) @ w_end + b_end.
    The last layer's hidden/skip tiles never round-trip through HBM."""
    skip = acc.astype(jnp.float32) + rs
    wn_out_ref[0] = (
        jnp.dot(skip.astype(dtype), w_end_ref[...],
                preferred_element_type=jnp.float32)
        + b_end_ref[...]
    )


def _edge_bias_suppress(in_act, b_edge, j, d: int, n_valid: int):
    """First-layer folded-bias bookkeeping: the standard kernels see zero
    hidden state in the halo beyond the sequence, so the folded per-tap
    start bias must be subtracted where a tap reads out-of-range rows
    (left tap at rows < d, right tap at rows >= n_valid - d).
    ``b_edge``: [2, 2C] array (left-tap, right-tap corrections)."""
    rows = j * BT + jax.lax.broadcasted_iota(jnp.int32, (BT, 1), 0)
    in_act = in_act - jnp.where(rows < d, b_edge[0], 0.0)
    return in_act - jnp.where(rows >= n_valid - d, b_edge[1], 0.0)


def _fold_first_taps(start_k, start_b, w_in):
    """Compose the start projection onto layer 0's taps (rank n_half):
    wp[t] = start_k @ w_in[t]; tap_bias[t] = start_b @ w_in[t].
    Returns (wp [3, n_half, 2C], b_extra [2C], b_edge [2, 2C])."""
    f32 = jnp.float32
    wp = jnp.einsum("nc,tco->tno", start_k.astype(f32), w_in.astype(f32))
    tap_bias = jnp.einsum("c,tco->to", start_b.astype(f32), w_in.astype(f32))
    return wp, tap_bias.sum(axis=0), jnp.stack([tap_bias[0], tap_bias[2]])


# --- streaming-ring plumbing (unpadded layout) -----------------------------


def _ring_zero_init(ring, t):
    """Slot 0 zeros = the conv's implicit left zero-padding."""

    @pl.when(t == 0)
    def _():
        ring[0] = jnp.zeros_like(ring[0])


def _ring_window(ring, x0_ref, t, j, n_tiles: int, d: int):
    """(mid, haloed window) for output tile j at grid step t = j + 1.
    Store at step s puts tile s in slot (s+1)%2, so before this step's
    store: tile j is in slot t%2, tile j-1 in slot (t+1)%2 (zeros when
    j == 0).  The lookahead tile j+1 is index-clamped at the last tile;
    mask it to the zero padding the conv semantics need."""
    prev1 = ring[t % 2]
    prev2 = ring[(t + 1) % 2]
    left = prev2[BT - d :, :]
    right = jnp.where(j < n_tiles - 1, x0_ref[0, :d, :], 0)
    return prev1, jnp.concatenate([left, prev1, right], axis=0)


def _ring_push(ring, x0_ref, t, n_last: int):
    """Store the current input tile for the next two grid steps."""

    @pl.when(t <= n_last)
    def _():
        ring[(t + 1) % 2] = x0_ref[0]


# ---------------------------------------------------------------------------
# Kernels: one per role; ``project_cond`` statically selects whether the
# conditioning is projected in-kernel (spect tile @ w_cond) or read
# pre-materialized (a 2C slice of cond_all via the BlockSpec index map).
# ---------------------------------------------------------------------------


def _kernel_stream2(x0_ref, *refs, dilation: int, n_tiles: int,
                    has_res: bool, n_valid: int, project_cond: bool,
                    row_split: int = 1):
    """Standard streaming WN layer on the unpadded layout.

    ``row_split > 1`` computes the coupling body in that many row
    sub-blocks, interleaving each sub-block's MXU matmuls with the previous
    sub-block's VPU gating — an explicit software-pipelining hint for
    Mosaic (the in-kernel ceiling is ~92% of the bf16 wall; the residual is
    VPU time not hidden under the MXU)."""
    if project_cond:
        (spect_ref, w_in_ref, b_in_ref, w_cond_ref, b_cond_ref,
         w_rs_ref, b_rs_ref, acc_ref, x_out_ref, skip_out_ref, ring) = refs
    else:
        (cond_ref, w_in_ref, b_in_ref,
         w_rs_ref, b_rs_ref, acc_ref, x_out_ref, skip_out_ref, ring) = refs
    t = pl.program_id(1)
    j = t - 1
    _ring_zero_init(ring, t)

    @pl.when(t >= 1)
    def _():
        w = w_in_ref[...]
        mid, xwin = _ring_window(ring, x0_ref, t, j, n_tiles, dilation)
        if row_split == 1:
            cond = (
                _incond(spect_ref, w_cond_ref, b_cond_ref)
                if project_cond else cond_ref[0].astype(jnp.float32)
            )
            in_act = _taps(xwin, w, dilation) + b_in_ref[...] + cond
            rs = _gate_rs(in_act, w.dtype, w_rs_ref, b_rs_ref)
            vmask = _row_mask_np(j, n_valid, n_tiles, (BT, 1))
            _store_layer_out(x_out_ref, skip_out_ref, mid, rs, acc_ref[0],
                             vmask, has_res)
        else:
            # per-half compute AND store: only one half's f32 intermediates
            # are live at a time (full-tile concat OOMs scoped VMEM at
            # reference size), and half h+1's matmuls can overlap half h's
            # VPU gating
            H = BT // row_split
            d = dilation
            C = x_out_ref.shape[-1]
            for h in range(row_split):
                rows = slice(h * H, (h + 1) * H)
                xw = xwin[h * H : h * H + H + 2 * d]
                if project_cond:
                    cond_h = (
                        jnp.dot(spect_ref[0, rows], w_cond_ref[...],
                                preferred_element_type=jnp.float32)
                        + b_cond_ref[...]
                    )
                else:
                    cond_h = cond_ref[0, rows].astype(jnp.float32)
                in_act_h = _taps(xw, w, d, H) + b_in_ref[...] + cond_h
                rs_h = (
                    jnp.dot(_gate(in_act_h, w.dtype), w_rs_ref[...],
                            preferred_element_type=jnp.float32)
                    + b_rs_ref[...]
                )
                if n_valid >= n_tiles * BT:
                    vmask_h = None
                else:
                    r = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
                    vmask_h = (j * BT + h * H + r) < n_valid
                acc_h = acc_ref[0, rows]
                mid_h = mid[rows]
                if has_res:
                    x_out_ref[0, rows] = _mask_rows(
                        (mid_h.astype(jnp.float32) + rs_h[:, :C]).astype(
                            x_out_ref.dtype), vmask_h,
                    )
                    skip_out_ref[0, rows] = acc_h + rs_h[:, C:].astype(
                        acc_h.dtype
                    )
                else:
                    x_out_ref[0, rows] = _mask_rows(mid_h, vmask_h)
                    skip_out_ref[0, rows] = acc_h + rs_h.astype(acc_h.dtype)

    _ring_push(ring, x0_ref, t, n_tiles - 1)


def _kernel_stream2_first(x0_ref, *refs, dilation: int, n_tiles: int,
                          n_valid: int, project_cond: bool):
    """First WN layer: its hidden input is ``xh = x0 @ start + b_s`` with
    rank <= n_half (the audio half has 2-4 channels, glow.py:118-121), so
    the three K=C dilated taps collapse into K=n_half taps COMPOSED onto x0
    (w'_t = start_k @ w_in[t]) — ~8 of the 21 MXU passes of a standard
    layer disappear, and the x input shrinks from [T, C] to [T, n_half].
    The skip accumulator starts at zero here, so there is no acc input."""
    if project_cond:
        (spect_ref, wp_in_ref, b_in_ref, b_edge_ref, w_cond_ref, b_cond_ref,
         w_rs_ref, b_rs_ref, start_k_ref, start_b_ref,
         x_out_ref, skip_out_ref, ring) = refs
    else:
        (cond_ref, wp_in_ref, b_in_ref, b_edge_ref,
         w_rs_ref, b_rs_ref, start_k_ref, start_b_ref,
         x_out_ref, skip_out_ref, ring) = refs
    t = pl.program_id(1)
    d = dilation
    j = t - 1
    _ring_zero_init(ring, t)

    @pl.when(t >= 1)
    def _():
        wp = wp_in_ref[...]                       # [3, n_half, 2C] composed
        mid, xwin = _ring_window(ring, x0_ref, t, j, n_tiles, d)
        cond = (
            _incond(spect_ref, w_cond_ref, b_cond_ref)
            if project_cond else cond_ref[0].astype(jnp.float32)
        )
        in_act = _taps(xwin, wp, d) + b_in_ref[...] + cond
        in_act = _edge_bias_suppress(in_act, b_edge_ref[...], j, d, n_valid)
        rs = _gate_rs(in_act, wp.dtype, w_rs_ref, b_rs_ref)
        # hidden state for the residual output, computed in-kernel (K=n_half)
        xh = (
            jnp.dot(mid, start_k_ref[...], preferred_element_type=jnp.float32)
            + start_b_ref[...]
        )
        vmask = _row_mask_np(j, n_valid, n_tiles, (BT, 1))
        _store_layer_out(x_out_ref, skip_out_ref, xh, rs, None, vmask,
                         has_res=True)

    _ring_push(ring, x0_ref, t, n_tiles - 1)


def _kernel_stream2_final(x0_ref, *refs, dilation: int, n_tiles: int,
                          n_valid: int, project_cond: bool,
                          fold_rs: bool):
    """Final WN layer + folded end projection (``glow.py:166-175``'s ``end``
    conv): emits the (b, log_s) coupling terms directly.  Tail rows past
    ``n_valid`` carry bias-driven values exactly like the unfused path's
    masked epilogue; callers zero them via the tile mask.

    ``fold_rs``: the final res/skip matmul's output only ever feeds the
    rank-E end projection (E = 2*n_half <= 8), so the wrapper pre-folds
    w_rs @ w_end into a [C, E] matrix — the kernel computes
    ``acts @ (w_rs·w_end) + acc @ w_end`` instead of
    ``(acc + acts @ w_rs) @ w_end``: the K=C x N=C rs pass (4 MXU
    pass-units) collapses to two N=E passes."""
    if project_cond:
        (spect_ref, w_in_ref, b_in_ref, w_cond_ref, b_cond_ref,
         w_rs_ref, b_rs_ref, acc_ref, w_end_ref, b_end_ref,
         wn_out_ref, ring) = refs
    else:
        (cond_ref, w_in_ref, b_in_ref,
         w_rs_ref, b_rs_ref, acc_ref, w_end_ref, b_end_ref,
         wn_out_ref, ring) = refs
    t = pl.program_id(1)
    j = t - 1
    _ring_zero_init(ring, t)

    @pl.when(t >= 1)
    def _():
        w = w_in_ref[...]
        _, xwin = _ring_window(ring, x0_ref, t, j, n_tiles, dilation)
        cond = (
            _incond(spect_ref, w_cond_ref, b_cond_ref)
            if project_cond else cond_ref[0].astype(jnp.float32)
        )
        in_act = _taps(xwin, w, dilation) + b_in_ref[...] + cond
        if fold_rs:
            # w_rs_ref holds w_rs @ w_end [C, E]; b_end_ref holds
            # b_rs @ w_end + b_end (b_rs_ref is unused padding)
            rs_e = jnp.dot(_gate(in_act, w.dtype), w_rs_ref[...],
                           preferred_element_type=jnp.float32)
            wn_out_ref[0] = (
                rs_e
                + jnp.dot(acc_ref[0], w_end_ref[...],
                          preferred_element_type=jnp.float32)
                + b_end_ref[...]
            )
        else:
            rs = _gate_rs(in_act, w.dtype, w_rs_ref, b_rs_ref)
            _store_final_out(wn_out_ref, rs, acc_ref[0], w_end_ref,
                             b_end_ref, w.dtype)

    _ring_push(ring, x0_ref, t, n_tiles - 1)


# ---------------------------------------------------------------------------
# Wrappers: BlockSpec tables + grid setup per (role, cond flavor).
# ---------------------------------------------------------------------------


def _out_idx(n_tiles: int):
    return lambda b, t, n=n_tiles: (b, jnp.clip(t - 1, 0, n - 1), 0)


def _in_idx(n_tiles: int):
    return lambda b, t, n=n_tiles: (b, jnp.minimum(t, n - 1), 0)


def _auto_interpret(interpret):
    if interpret is None:  # auto-interpret off-TPU (CPU tests)
        return jax.default_backend() != "tpu"
    return interpret


def wn_layer_stream2(
    x: jnp.ndarray,         # [B, T, C] hidden, T % BT == 0, NO pad tiles
    spect: jnp.ndarray,     # [B, T, M]
    w_in: jnp.ndarray,      # [3, C, 2C]
    b_in: jnp.ndarray,      # [2C] f32
    w_cond: jnp.ndarray,    # [M, 2C]
    b_cond: jnp.ndarray,    # [2C] f32
    w_rs: jnp.ndarray,      # [C, 2C] or [C, C] (last layer)
    b_rs: jnp.ndarray,
    skip_acc: jnp.ndarray,  # [B, T, C] running skip sum (donated)
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
    row_split: int = 1,
):
    """Unpadded streaming fused WN layer -> (x_new, skip_acc + skip)."""
    interpret = _auto_interpret(interpret)
    B, T, C = x.shape
    M = spect.shape[-1]
    assert T % BT == 0 and dilation <= BT
    n_tiles = T // BT
    has_res = w_rs.shape[-1] == 2 * C
    if n_valid is None:
        n_valid = T

    kern = functools.partial(
        _kernel_stream2, dilation=dilation, n_tiles=n_tiles, has_res=has_res,
        n_valid=n_valid, project_cond=True, row_split=row_split,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, M), oi),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((M, 2 * C), lambda b, t: (0, 0)),
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
        input_output_aliases={8: 1},
        interpret=interpret,
    )(x, spect, w_in, b_in, w_cond, b_cond, w_rs, b_rs, skip_acc)
    return x_out, skip_out


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
    interpret = _auto_interpret(interpret)
    B, T, n_half = x0.shape
    M = spect.shape[-1]
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
        n_valid=n_valid, project_cond=True,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    x_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, n_half), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, M), oi),
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
            pl.BlockSpec((1, BT, C), oi),
            pl.BlockSpec((1, BT, C), oi),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), spect.dtype),
            jax.ShapeDtypeStruct((B, T, C), spect.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, n_half), x0.dtype)],
        interpret=interpret,
    )(x0, spect, wp.astype(x0.dtype), b_all, b_edge,
      w_cond, b_cond, w_rs, b_rs, start_k, start_b.astype(jnp.float32))
    return x_out, skip_out


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
    fold_rs: bool = True,
) -> jnp.ndarray:
    """Unpadded streaming final WN layer + end projection -> wn_out
    [B, T, E] f32.  ``fold_rs`` (default) collapses the K=C final res/skip
    matmul into the rank-E end projection (see ``_kernel_stream2_final``)."""
    interpret = _auto_interpret(interpret)
    B, T, C = x.shape
    M = spect.shape[-1]
    E = w_end.shape[-1]
    assert T % BT == 0 and dilation <= BT
    assert w_rs.shape[-1] == C, "final layer emits skip only"
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
        n_valid=n_valid, project_cond=True, fold_rs=fold_rs,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    (wn_out,) = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, M), oi),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((2 * C,), lambda b, t: (0,)),
            pl.BlockSpec((M, 2 * C), lambda b, t: (0, 0)),
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
    )(x, spect, w_in, b_in, w_cond, b_cond, w_rs_eff, b_rs_eff, skip_acc,
      w_end, b_end_eff)
    return wn_out


# ---------------------------------------------------------------------------
# Tensor-parallel partial kernels (used per-device inside shard_map by
# parallel/tp.py): the device owns a gate-pair-consistent 2C/p slice of the
# in/cond columns and the matching C/p rows of the res/skip matmul, computes
# taps + gate + rs on its slice, and emits the PARTIAL rs [B, T, rs_out] in
# f32 for the one-per-layer psum.  The residual add / skip accumulation and
# biases happen post-psum in XLA (they need the full-channel sum).
# ---------------------------------------------------------------------------


def _kernel_stream2_partial(x0_ref, spect_ref, w_in_ref, b_in_ref,
                            w_cond_ref, b_cond_ref, w_rs_ref,
                            rs_out_ref, ring, *, dilation: int, n_tiles: int,
                            n_valid: int, edge_bias: bool):
    """Partial-channel streaming WN layer: local columns in, partial rs out.
    ``edge_bias``: the first-layer composed-tap variant passes folded-bias
    edge corrections stacked into b_in_ref rows 1..2 (see
    ``wn_layer_stream2_first_partial``)."""
    t = pl.program_id(1)
    d = dilation
    j = t - 1
    _ring_zero_init(ring, t)

    @pl.when(t >= 1)
    def _():
        w = w_in_ref[...]
        _, xwin = _ring_window(ring, x0_ref, t, j, n_tiles, d)
        cond = _incond(spect_ref, w_cond_ref, b_cond_ref)
        b_stack = b_in_ref[...]
        in_act = _taps(xwin, w, d) + b_stack[0] + cond
        if edge_bias:
            in_act = _edge_bias_suppress(in_act, b_stack[1:], j, d, n_valid)
        rs = jnp.dot(_gate(in_act, w.dtype), w_rs_ref[...],
                     preferred_element_type=jnp.float32)
        vmask = _row_mask_np(j, n_valid, n_tiles, (BT, 1))
        rs_out_ref[0] = _mask_rows(rs, vmask)

    _ring_push(ring, x0_ref, t, n_tiles - 1)


def wn_layer_stream2_partial(
    x: jnp.ndarray,         # [B, T, K] replicated hidden (or x0 audio half)
    spect: jnp.ndarray,     # [B, T, M]
    w_in: jnp.ndarray,      # [3, K, 2Cp] local column slice
    b_in: jnp.ndarray,      # [2Cp] f32 local (pre-psum, added once here)
    w_cond: jnp.ndarray,    # [M, 2Cp]
    b_cond: jnp.ndarray,    # [2Cp] f32
    w_rs: jnp.ndarray,      # [Cp, rs_out] local row slice (rs_out = 2C or C)
    dilation: int,
    b_edge: jnp.ndarray | None = None,   # [2, 2Cp] first-layer corrections
    interpret: bool | None = None,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """Per-device TP WN layer -> partial rs [B, T, rs_out] f32 (psum me).
    The res/skip bias is NOT added (add it once after the psum)."""
    interpret = _auto_interpret(interpret)
    B, T, K = x.shape
    M = spect.shape[-1]
    rs_out = w_rs.shape[-1]
    assert T % BT == 0 and dilation <= BT
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T

    if b_edge is None:
        b_stack = b_in.astype(jnp.float32)[None]          # [1, 2Cp]
        edge = False
    else:
        b_stack = jnp.concatenate(
            [b_in.astype(jnp.float32)[None], b_edge.astype(jnp.float32)],
            axis=0,
        )                                                  # [3, 2Cp]
        edge = True

    kern = functools.partial(
        _kernel_stream2_partial, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid, edge_bias=edge,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    (rs_part,) = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, K), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, M), oi),
            pl.BlockSpec(w_in.shape, lambda b, t: (0, 0, 0)),
            pl.BlockSpec(b_stack.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(w_cond.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(b_cond.shape, lambda b, t: (0,)),
            pl.BlockSpec(w_rs.shape, lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, rs_out), oi),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, rs_out), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, K), x.dtype)],
        interpret=interpret,
    )(x, spect, w_in, b_stack, w_cond, b_cond, w_rs)
    return rs_part


