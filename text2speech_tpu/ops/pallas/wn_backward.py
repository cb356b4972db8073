"""Probe: Pallas BACKWARD kernel for the k=3 dilated WN conv.

``docs/KERNELS.md`` closes the "custom VJP over the serving kernels"
question by arithmetic and names one remaining form that could beat XLA's
conv backward for training: a from-scratch Pallas backward (transposed
taps for dL/dx + dL/dW accumulation in VMEM, one read of the cotangent).
This module BUILDS that form at its most favorable scope — a single
layer's conv backward, no surrounding machinery — so the question closes
with a measurement instead of an estimate (VERDICT r3 #8).
``benchmarks/wn_backward_probe.py`` times it against ``jax.vjp`` of the
identical ``lax.conv_general_dilated`` (the shipping ``conv_impl=
"xla_conv"`` training lowering) on the TPU; the verdict lives in
``docs/KERNELS.md``.

Math (channels-last, SAME zero padding, dilation d, kernel 3):

    fwd:  y[t] = x[t-d] @ W0 + x[t] @ W1 + x[t+d] @ W2        [B, T, 2C]
    bwd:  dx[t] = g[t+d] @ W0^T + g[t] @ W1^T + g[t-d] @ W2^T  (transposed
          taps — the same ``_taps`` helper with the weight stack reversed
          and transposed)
          dW_j  = sum_t x[t + (j-1)d]^T @ g[t]                 [3, C, 2C]

Grid/tiling mirrors the padded oracle family (``wn_block_padded``): one
zero tile each side of the time axis, halos read through the (t-1, t,
t+1) neighbor BlockSpec tiles.  dW accumulates across grid steps in a
VMEM-resident output block (constant index map; TPU grids execute
sequentially).

Reference math: ``/root/reference/waveglow/glow.py:154-175`` (the conv
whose backward dominates WaveGlow training time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .wn_block import BT, _auto_interpret, _taps


def _bwd_kernel(gm_ref, g0_ref, gp_ref, xm_ref, x0_ref, xp_ref,
                wt_ref, dx_ref, dw_ref, *, dilation: int, n_prog: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    d = dilation
    is_pad = (t == 0) | (t == n_prog - 1)

    # --- dL/dx: transposed taps over the cotangent halo window ------------
    @pl.when(is_pad)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when(~is_pad)
    def _():
        gwin = jnp.concatenate(
            [gm_ref[0, BT - d :, :], g0_ref[0], gp_ref[0, :d, :]], axis=0)
        dx_ref[0] = _taps(gwin, wt_ref[...], d).astype(dx_ref.dtype)

    # --- dL/dW: per-tile contributions accumulated in the VMEM-resident
    # output block (pad tiles contribute exact zeros — g's pad is zero) ----
    xwin = jnp.concatenate(
        [xm_ref[0, BT - d :, :], x0_ref[0], xp_ref[0, :d, :]], axis=0)
    g = g0_ref[0]
    contrib = jnp.stack([
        jnp.dot(xwin[j * d : j * d + BT].T, g,
                preferred_element_type=jnp.float32)
        for j in range(3)
    ])
    first = (b == 0) & (t == 0)

    @pl.when(first)
    def _():
        dw_ref[...] = contrib

    @pl.when(~first)
    def _():
        dw_ref[...] += contrib


def conv_k3_bwd_pallas(x_pad: jnp.ndarray, g_pad: jnp.ndarray,
                       w: jnp.ndarray, dilation: int):
    """Backward of the k=3 dilated SAME conv for ONE-TILE-PADDED inputs
    (``wn_block_padded.pad_tiles`` layout): x_pad [B, T+2BT, C] bf16,
    g_pad [B, T+2BT, 2C] cotangent, w [3, C, 2C].  Returns
    (dx [B, T, C] in x's dtype, dw [3, C, 2C] f32)."""
    B, Tp, C = x_pad.shape
    assert Tp % BT == 0 and g_pad.shape == (B, Tp, 2 * C)
    n_prog = Tp // BT
    d = dilation
    assert 0 < d <= BT
    wt = jnp.stack([w[2].T, w[1].T, w[0].T])        # [3, 2C, C]

    dx_pad, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, dilation=d, n_prog=n_prog),
        grid=(B, n_prog),
        in_specs=[
            pl.BlockSpec((1, BT, 2 * C),
                         lambda b, t: (b, jnp.maximum(t - 1, 0), 0)),
            pl.BlockSpec((1, BT, 2 * C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, BT, 2 * C),
                         lambda b, t: (b, jnp.minimum(t + 1, n_prog - 1), 0)),
            pl.BlockSpec((1, BT, C),
                         lambda b, t: (b, jnp.maximum(t - 1, 0), 0)),
            pl.BlockSpec((1, BT, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, BT, C),
                         lambda b, t: (b, jnp.minimum(t + 1, n_prog - 1), 0)),
            pl.BlockSpec((3, 2 * C, C), lambda b, t: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((3, C, 2 * C), lambda b, t: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, C), x_pad.dtype),
            jax.ShapeDtypeStruct((3, C, 2 * C), jnp.float32),
        ],
        interpret=_auto_interpret(None),
    )(g_pad, g_pad, g_pad, x_pad, x_pad, x_pad, wt)
    return dx_pad[:, BT:-BT], dw


def conv_k3_fwd_xla(x: jnp.ndarray, w: jnp.ndarray, dilation: int):
    """The shipping training lowering of the same conv
    (``models.waveglow.WNConv(conv_impl="xla_conv")`` form): channels-last
    ``lax.conv_general_dilated``, SAME zero padding."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(dilation, dilation)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
