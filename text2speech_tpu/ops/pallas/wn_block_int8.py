"""Int8 fused WN-layer Pallas kernels (quantized serving path).

Same coupling math as the bf16 streaming family in :mod:`.wn_block`
(``/root/reference/waveglow/glow.py:154-175``), with the three large matmul
families — dilated taps, conditioning projection, res/skip — run on the MXU
in int8 (v5e: ~2x the bf16 FLOP rate; measured 303 TOP/s vs 163 TFLOP/s on
this chip with a chained-matmul probe).  The quantization scheme:

* **weights**: static per-output-channel scales, folded from weight-norm
  once per checkpoint (``models/waveglow_fused.quantize_waveglow_int8``);
  the 3 dilated taps share one column scale so their int32 partials can be
  combined with only per-row rescales;
* **hidden state x**: dynamic per-row (per audio group) int8 + one f32
  scale, quantized in-kernel at each layer's store.  Row scales are exact
  to apply post-dot because output row r of tap t only reads window row
  r + t*d: the dequant is row-separable;
* **conditioning input**: per-row int8 + scale, quantized ONCE per call
  outside the kernels (the same grouped spect feeds all layers);
* **gated activations**: tanh·σ is bounded in (-1, 1) — fixed scale 127,
  no amax pass;
* **skip accumulation, coupling arithmetic, first-layer composed taps
  (K = n_half ≤ 4), final-layer folded end projection (N = E ≤ 8)**: stay
  bf16/f32 — their MXU cost is negligible and precision matters there.

The streaming-ring layout is identical to the bf16 family (one HBM read of
x per layer through a 2-slot VMEM ring, in-kernel edge zero-padding); the
scale stream rides a second [2, BT, 1] ring with the same plumbing.  A
zeroed halo dequantizes to exactly 0 regardless of scale, so the conv edge
semantics carry over unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .wn_block import (
    BT,
    _auto_interpret,
    _edge_bias_suppress,
    _fold_first_taps,
    _gate,
    _in_idx,
    _mask_rows,
    _out_idx,
    _ring_push,
    _ring_window,
    _taps,
    _ring_zero_init,
    _row_mask_np,
)

# ---------------------------------------------------------------------------
# Quantized coupling-body helpers (the int8 counterparts of wn_block's
# _taps/_incond/_gate_rs; everything dequantizes into f32 before the gate).
# ---------------------------------------------------------------------------


def _taps_q(qxwin, sxwin, qw, sw, d: int, n_rows: int = BT):
    """Three dilated taps in int8: int32 MXU partials, per-row dequant per
    tap (row-separable), shared per-column weight scale applied once."""
    acc = None
    for t in range(3):
        dq = jnp.dot(qxwin[t * d : t * d + n_rows], qw[t],
                     preferred_element_type=jnp.int32)
        term = dq.astype(jnp.float32) * sxwin[t * d : t * d + n_rows]
        acc = term if acc is None else acc + term
    return acc * sw


def _incond_q(qspect_ref, sspect_ref, w_cond_ref, sw_cond_ref, b_cond_ref):
    """Conditioning projection in int8 over the pre-quantized grouped
    spect: int32 dot, per-row spect scale, per-column weight scale."""
    dq = jnp.dot(qspect_ref[0], w_cond_ref[...],
                 preferred_element_type=jnp.int32)
    return (
        dq.astype(jnp.float32) * sspect_ref[0] * sw_cond_ref[...]
        + b_cond_ref[...]
    )


def _gate_q(in_act):
    """Gated tanh·σ quantized at fixed scale 127 (the product is bounded
    in (-1, 1) — no amax pass needed)."""
    C = in_act.shape[-1] // 2
    acts = jnp.tanh(in_act[:, :C]) * jax.nn.sigmoid(in_act[:, C:])
    return jnp.round(acts * 127.0).astype(jnp.int8)


def _rs_q(qacts, w_rs_ref, sw_rs_ref, b_rs_ref):
    """Res/skip matmul in int8: activations at fixed scale 127, weights at
    per-column scales."""
    dq = jnp.dot(qacts, w_rs_ref[...], preferred_element_type=jnp.int32)
    return (
        dq.astype(jnp.float32) * (sw_rs_ref[...] * (1.0 / 127.0))
        + b_rs_ref[...]
    )


def rowquant_f32(xf: jnp.ndarray, eps: float = 1e-12):
    """THE per-row dynamic int8 quantization scheme (one definition for
    every activation-quant site in the framework: these kernels, the
    XLA-level input quant, and the int8 decoder's ``_qdot``): [..., C]
    f32 -> (int8, [..., 1] f32 scale), amax/127 with an eps floor so
    all-zero rows (masked tile pad) quantize to zeros."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, eps) * (1.0 / 127.0)
    return jnp.round(xf / s).astype(jnp.int8), s


def _quant_rows(x, eps: float = 1e-12):
    """In-kernel per-row quantization ([N, C] already f32)."""
    return rowquant_f32(x, eps)


def quantize_rows(x: jnp.ndarray, eps: float = 1e-12):
    """XLA-level per-row quantization for kernel INPUTS ([B, T, C] over the
    channel axis) — used once per call on the grouped conditioning."""
    return rowquant_f32(x.astype(jnp.float32), eps)


def quantize_cols(w: jnp.ndarray, axes=None, eps: float = 1e-12):
    """Static per-output-channel weight quantization: scales over every
    axis except the last (so the 3 dilated taps share one column scale)."""
    wf = w.astype(jnp.float32)
    if axes is None:
        axes = tuple(range(wf.ndim - 1))
    amax = jnp.max(jnp.abs(wf), axis=axes, keepdims=False)
    s = jnp.maximum(amax, eps) * (1.0 / 127.0)
    return jnp.round(wf / s).astype(jnp.int8), s


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _kernel_stream2_q(qx_ref, sx_ref, qspect_ref, sspect_ref,
                      w_in_ref, sw_in_ref, b_in_ref,
                      w_cond_ref, sw_cond_ref, b_cond_ref,
                      w_rs_ref, sw_rs_ref, b_rs_ref, acc_ref,
                      qx_out_ref, sx_out_ref, skip_out_ref,
                      ring_q, ring_s, *, dilation: int, n_tiles: int,
                      n_valid: int):
    """Standard int8 streaming WN layer (always has a residual output —
    it serves layers 1..L-2)."""
    t = pl.program_id(1)
    j = t - 1
    _ring_zero_init(ring_q, t)
    _ring_zero_init(ring_s, t)

    @pl.when(t >= 1)
    def _():
        qmid, qxwin = _ring_window(ring_q, qx_ref, t, j, n_tiles, dilation)
        smid, sxwin = _ring_window(ring_s, sx_ref, t, j, n_tiles, dilation)
        in_act = (
            _taps_q(qxwin, sxwin, w_in_ref[...], sw_in_ref[...], dilation)
            + b_in_ref[...]
            + _incond_q(qspect_ref, sspect_ref, w_cond_ref, sw_cond_ref,
                        b_cond_ref)
        )
        rs = _rs_q(_gate_q(in_act), w_rs_ref, sw_rs_ref, b_rs_ref)
        C = qx_out_ref.shape[-1]
        x_new = qmid.astype(jnp.float32) * smid + rs[:, :C]
        vmask = _row_mask_np(j, n_valid, n_tiles, (BT, 1))
        qx_new, s_new = _quant_rows(_mask_rows(x_new, vmask))
        qx_out_ref[0] = qx_new
        sx_out_ref[0] = s_new
        skip_out_ref[0] = acc_ref[0] + rs[:, C:].astype(acc_ref.dtype)

    _ring_push(ring_q, qx_ref, t, n_tiles - 1)
    _ring_push(ring_s, sx_ref, t, n_tiles - 1)


def _kernel_stream2_first_q(x0_ref, qspect_ref, sspect_ref,
                            wp_in_ref, b_in_ref, b_edge_ref,
                            w_cond_ref, sw_cond_ref, b_cond_ref,
                            w_rs_ref, sw_rs_ref, b_rs_ref,
                            start_k_ref, start_b_ref,
                            qx_out_ref, sx_out_ref, skip_out_ref,
                            ring, *, dilation: int, n_tiles: int,
                            n_valid: int):
    """First WN layer, int8 cond/rs: the composed taps stay bf16 (their
    contraction is K = n_half ≤ 4 — negligible MXU time), the hidden
    output is quantized per row for the downstream int8 layers."""
    t = pl.program_id(1)
    d = dilation
    j = t - 1
    _ring_zero_init(ring, t)

    @pl.when(t >= 1)
    def _():
        wp = wp_in_ref[...]
        mid, xwin = _ring_window(ring, x0_ref, t, j, n_tiles, d)
        # bf16 composed taps — the SHARED tap math (the int8 path only
        # changes cond/rs; the K<=n_half composed taps stay bf16)
        in_act = _taps(xwin, wp, d) + b_in_ref[...] + _incond_q(
            qspect_ref, sspect_ref, w_cond_ref, sw_cond_ref, b_cond_ref
        )
        in_act = _edge_bias_suppress(in_act, b_edge_ref[...], j, d, n_valid)
        rs = _rs_q(_gate_q(in_act), w_rs_ref, sw_rs_ref, b_rs_ref)
        xh = (
            jnp.dot(mid, start_k_ref[...], preferred_element_type=jnp.float32)
            + start_b_ref[...]
        )
        C = qx_out_ref.shape[-1]
        x_new = xh + rs[:, :C]
        vmask = _row_mask_np(j, n_valid, n_tiles, (BT, 1))
        qx_new, s_new = _quant_rows(_mask_rows(x_new, vmask))
        qx_out_ref[0] = qx_new
        sx_out_ref[0] = s_new
        skip_out_ref[0] = rs[:, C:].astype(skip_out_ref.dtype)

    _ring_push(ring, x0_ref, t, n_tiles - 1)


def _kernel_stream2_final_q(qx_ref, sx_ref, qspect_ref, sspect_ref,
                            w_in_ref, sw_in_ref, b_in_ref,
                            w_cond_ref, sw_cond_ref, b_cond_ref,
                            w_rs_ref, acc_ref, w_end_ref, b_end_ref,
                            wn_out_ref, ring_q, ring_s, *, dilation: int,
                            n_tiles: int, n_valid: int):
    """Final WN layer, int8 taps/cond + bf16 folded end projection
    (``fold_rs`` of the bf16 family is always on here: w_rs_ref holds
    w_rs @ w_end [C, E], b_end_ref holds b_rs @ w_end + b_end)."""
    t = pl.program_id(1)
    j = t - 1
    _ring_zero_init(ring_q, t)
    _ring_zero_init(ring_s, t)

    @pl.when(t >= 1)
    def _():
        _, qxwin = _ring_window(ring_q, qx_ref, t, j, n_tiles, dilation)
        _, sxwin = _ring_window(ring_s, sx_ref, t, j, n_tiles, dilation)
        in_act = (
            _taps_q(qxwin, sxwin, w_in_ref[...], sw_in_ref[...], dilation)
            + b_in_ref[...]
            + _incond_q(qspect_ref, sspect_ref, w_cond_ref, sw_cond_ref,
                        b_cond_ref)
        )
        dtype = w_rs_ref.dtype
        rs_e = jnp.dot(_gate(in_act, dtype), w_rs_ref[...],
                       preferred_element_type=jnp.float32)
        wn_out_ref[0] = (
            rs_e
            + jnp.dot(acc_ref[0], w_end_ref[...],
                      preferred_element_type=jnp.float32)
            + b_end_ref[...]
        )

    _ring_push(ring_q, qx_ref, t, n_tiles - 1)
    _ring_push(ring_s, sx_ref, t, n_tiles - 1)


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


def _w_spec(x):
    nd = x.ndim
    return pl.BlockSpec(x.shape, lambda b, t, n=nd: (0,) * n)


def wn_layer_stream2_int8(
    qx: jnp.ndarray,        # [B, T, C] int8 hidden
    sx: jnp.ndarray,        # [B, T, 1] f32 per-row scales
    qspect: jnp.ndarray,    # [B, T, M] int8 grouped cond
    sspect: jnp.ndarray,    # [B, T, 1] f32
    qw_in: jnp.ndarray,     # [3, C, 2C] int8
    sw_in: jnp.ndarray,     # [2C] f32 (shared across taps)
    b_in: jnp.ndarray,      # [2C] f32
    qw_cond: jnp.ndarray,   # [M, 2C] int8
    sw_cond: jnp.ndarray,   # [2C] f32
    b_cond: jnp.ndarray,    # [2C] f32
    qw_rs: jnp.ndarray,     # [C, 2C] int8
    sw_rs: jnp.ndarray,     # [2C] f32
    b_rs: jnp.ndarray,      # [2C] f32
    skip_acc: jnp.ndarray,  # [B, T, C] bf16 running skip sum (donated)
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
):
    """Standard int8 streaming WN layer -> (qx_new, sx_new, skip_new)."""
    interpret = _auto_interpret(interpret)
    B, T, C = qx.shape
    M = qspect.shape[-1]
    assert T % BT == 0 and dilation <= BT
    assert qw_rs.shape[-1] == 2 * C
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T

    kern = functools.partial(
        _kernel_stream2_q, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    qx_out, sx_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, 1), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, M), oi),
            pl.BlockSpec((1, BT, 1), oi),
            _w_spec(qw_in), _w_spec(sw_in), _w_spec(b_in),
            _w_spec(qw_cond), _w_spec(sw_cond), _w_spec(b_cond),
            _w_spec(qw_rs), _w_spec(sw_rs), _w_spec(b_rs),
            pl.BlockSpec((1, BT, C), oi),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), oi),
            pl.BlockSpec((1, BT, 1), oi),
            pl.BlockSpec((1, BT, C), oi),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), jnp.int8),
            jax.ShapeDtypeStruct((B, T, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, T, C), skip_acc.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BT, C), jnp.int8),
            pltpu.VMEM((2, BT, 1), jnp.float32),
        ],
        input_output_aliases={13: 2},
        interpret=interpret,
    )(qx, sx, qspect, sspect, qw_in, sw_in, b_in, qw_cond, sw_cond, b_cond,
      qw_rs, sw_rs, b_rs, skip_acc)
    return qx_out, sx_out, skip_out


def wn_layer_stream2_first_int8(
    x0: jnp.ndarray,        # [B, T, n_half] audio half (bf16)
    qspect: jnp.ndarray,    # [B, T, M] int8
    sspect: jnp.ndarray,    # [B, T, 1] f32
    start_k: jnp.ndarray,   # [n_half, C] bf16
    start_b: jnp.ndarray,   # [C] f32
    w_in: jnp.ndarray,      # [3, C, 2C] bf16 (composed with start here)
    b_in: jnp.ndarray,      # [2C] f32
    qw_cond: jnp.ndarray,   # [M, 2C] int8
    sw_cond: jnp.ndarray,   # [2C] f32
    b_cond: jnp.ndarray,    # [2C] f32
    qw_rs: jnp.ndarray,     # [C, 2C] int8
    sw_rs: jnp.ndarray,     # [2C] f32
    b_rs: jnp.ndarray,      # [2C] f32
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
):
    """Fused start + first WN layer, int8 cond/rs ->
    (qx_hidden, sx_hidden, skip)."""
    interpret = _auto_interpret(interpret)
    B, T, n_half = x0.shape
    M = qspect.shape[-1]
    C = start_k.shape[-1]
    assert T % BT == 0 and dilation <= BT
    assert qw_rs.shape[-1] == 2 * C
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T

    wp, b_extra, b_edge = _fold_first_taps(start_k, start_b, w_in)
    b_all = b_in.astype(jnp.float32) + b_extra

    kern = functools.partial(
        _kernel_stream2_first_q, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    wp = wp.astype(x0.dtype)
    start_kf = start_k.astype(x0.dtype)
    start_bf = start_b.astype(jnp.float32)
    qx_out, sx_out, skip_out = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, n_half), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, M), oi),
            pl.BlockSpec((1, BT, 1), oi),
            _w_spec(wp), _w_spec(b_all), _w_spec(b_edge),
            _w_spec(qw_cond), _w_spec(sw_cond), _w_spec(b_cond),
            _w_spec(qw_rs), _w_spec(sw_rs), _w_spec(b_rs),
            _w_spec(start_kf), _w_spec(start_bf),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), oi),
            pl.BlockSpec((1, BT, 1), oi),
            pl.BlockSpec((1, BT, C), oi),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), jnp.int8),
            jax.ShapeDtypeStruct((B, T, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, T, C), jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, n_half), x0.dtype)],
        interpret=interpret,
    )(x0, qspect, sspect, wp, b_all, b_edge, qw_cond, sw_cond, b_cond,
      qw_rs, sw_rs, b_rs, start_kf, start_bf)
    return qx_out, sx_out, skip_out


def _kernel_stream2_partial_q(qx_ref, sx_ref, qspect_ref, sspect_ref,
                              w_in_ref, sw_in_ref, b_in_ref,
                              w_cond_ref, sw_cond_ref, b_cond_ref,
                              w_rs_ref, sw_rs_ref,
                              rs_out_ref, ring_q, ring_s, *, dilation: int,
                              n_tiles: int, n_valid: int):
    """Tensor-parallel int8 partial layer: the device owns a
    gate-pair-consistent 2C/p column slice (see ``wn_block``'s partial
    family) — int8 taps + cond + gate + local res/skip rows, emitting the
    PARTIAL rs [BT, rs_out] f32 for the one-per-layer psum.  Per-device
    weight scales are exact: dequantization happens before the psum, so
    each device's contribution uses its own column/row scales."""
    t = pl.program_id(1)
    j = t - 1
    _ring_zero_init(ring_q, t)
    _ring_zero_init(ring_s, t)

    @pl.when(t >= 1)
    def _():
        _, qxwin = _ring_window(ring_q, qx_ref, t, j, n_tiles, dilation)
        _, sxwin = _ring_window(ring_s, sx_ref, t, j, n_tiles, dilation)
        in_act = (
            _taps_q(qxwin, sxwin, w_in_ref[...], sw_in_ref[...], dilation)
            + b_in_ref[...]
            + _incond_q(qspect_ref, sspect_ref, w_cond_ref, sw_cond_ref,
                        b_cond_ref)
        )
        dq = jnp.dot(_gate_q(in_act), w_rs_ref[...],
                     preferred_element_type=jnp.int32)
        rs = dq.astype(jnp.float32) * (sw_rs_ref[...] * (1.0 / 127.0))
        vmask = _row_mask_np(j, n_valid, n_tiles, (BT, 1))
        rs_out_ref[0] = _mask_rows(rs, vmask)

    _ring_push(ring_q, qx_ref, t, n_tiles - 1)
    _ring_push(ring_s, sx_ref, t, n_tiles - 1)


def wn_layer_stream2_partial_int8(
    qx: jnp.ndarray,        # [B, T, C] int8 replicated hidden
    sx: jnp.ndarray,        # [B, T, 1] f32
    qspect: jnp.ndarray,    # [B, T, M] int8 replicated grouped cond
    sspect: jnp.ndarray,    # [B, T, 1] f32
    qw_in: jnp.ndarray,     # [3, C, 2Cp] int8 local column slice
    sw_in: jnp.ndarray,     # [2Cp] f32
    b_in: jnp.ndarray,      # [2Cp] f32 local (added once, pre-gate)
    qw_cond: jnp.ndarray,   # [M, 2Cp] int8
    sw_cond: jnp.ndarray,   # [2Cp] f32
    b_cond: jnp.ndarray,    # [2Cp] f32
    qw_rs: jnp.ndarray,     # [Cp, rs_out] int8 local row slice
    sw_rs: jnp.ndarray,     # [rs_out] f32 per-device column scales
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """Per-device TP int8 WN layer -> partial rs [B, T, rs_out] f32
    (psum me; the res/skip bias is NOT added — add it once post-psum)."""
    interpret = _auto_interpret(interpret)
    B, T, C = qx.shape
    M = qspect.shape[-1]
    rs_out = qw_rs.shape[-1]
    assert T % BT == 0 and dilation <= BT
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T

    kern = functools.partial(
        _kernel_stream2_partial_q, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    (rs_part,) = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, 1), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, M), oi),
            pl.BlockSpec((1, BT, 1), oi),
            _w_spec(qw_in), _w_spec(sw_in), _w_spec(b_in),
            _w_spec(qw_cond), _w_spec(sw_cond), _w_spec(b_cond),
            _w_spec(qw_rs), _w_spec(sw_rs),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, rs_out), oi),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, rs_out), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BT, C), jnp.int8),
            pltpu.VMEM((2, BT, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qx, sx, qspect, sspect, qw_in, sw_in, b_in, qw_cond, sw_cond, b_cond,
      qw_rs, sw_rs)
    return rs_part


def wn_layer_stream2_final_int8(
    qx: jnp.ndarray,        # [B, T, C] int8
    sx: jnp.ndarray,        # [B, T, 1] f32
    qspect: jnp.ndarray,    # [B, T, M] int8
    sspect: jnp.ndarray,    # [B, T, 1] f32
    qw_in: jnp.ndarray,     # [3, C, 2C] int8
    sw_in: jnp.ndarray,     # [2C] f32
    b_in: jnp.ndarray,      # [2C] f32
    qw_cond: jnp.ndarray,   # [M, 2C] int8
    sw_cond: jnp.ndarray,   # [2C] f32
    b_cond: jnp.ndarray,    # [2C] f32
    w_rs: jnp.ndarray,      # [C, C] bf16 (folded with w_end below)
    b_rs: jnp.ndarray,      # [C] f32
    skip_acc: jnp.ndarray,  # [B, T, C] bf16
    w_end: jnp.ndarray,     # [C, E] bf16
    b_end: jnp.ndarray,     # [E] f32
    dilation: int,
    interpret: bool | None = None,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """Final int8 WN layer + folded end projection -> wn_out [B, T, E] f32
    (the bf16 family's ``fold_rs`` collapse is always applied)."""
    interpret = _auto_interpret(interpret)
    B, T, C = qx.shape
    M = qspect.shape[-1]
    E = w_end.shape[-1]
    assert T % BT == 0 and dilation <= BT
    assert w_rs.shape[-1] == C
    n_tiles = T // BT
    if n_valid is None:
        n_valid = T

    f32 = jnp.float32
    w_rs_eff = (w_rs.astype(f32) @ w_end.astype(f32)).astype(w_rs.dtype)
    b_end_eff = b_rs.astype(f32) @ w_end.astype(f32) + b_end.astype(f32)

    kern = functools.partial(
        _kernel_stream2_final_q, dilation=dilation, n_tiles=n_tiles,
        n_valid=n_valid,
    )
    from jax.experimental.pallas import tpu as pltpu

    oi = _out_idx(n_tiles)
    (wn_out,) = pl.pallas_call(
        kern,
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, BT, C), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, 1), _in_idx(n_tiles)),
            pl.BlockSpec((1, BT, M), oi),
            pl.BlockSpec((1, BT, 1), oi),
            _w_spec(qw_in), _w_spec(sw_in), _w_spec(b_in),
            _w_spec(qw_cond), _w_spec(sw_cond), _w_spec(b_cond),
            _w_spec(w_rs_eff),
            pl.BlockSpec((1, BT, C), oi),
            _w_spec(w_end), _w_spec(b_end_eff),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, E), oi),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, E), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BT, C), jnp.int8),
            pltpu.VMEM((2, BT, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qx, sx, qspect, sspect, qw_in, sw_in, b_in, qw_cond, sw_cond, b_cond,
      w_rs_eff, skip_acc, w_end.astype(w_rs.dtype), b_end_eff)
    return wn_out
