"""Int8 fused vocoder kernels: emulation parity + end-to-end fidelity.

Each kernel is checked against a pure-jnp emulation performing the IDENTICAL
quantized arithmetic (same int32 dots, same rounding, same scale placement),
so the streaming-ring plumbing and BlockSpec wiring are isolated from
quantization error.  Then ``infer_fused_int8`` is compared against the f32
reference path end-to-end and must stay within a calibrated SNR band.
Reference math being quantized: ``/root/reference/waveglow/glow.py:154-175``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2speech_tpu.config import WaveGlowConfig
from text2speech_tpu.models.chunked import draw_noise
from text2speech_tpu.models.waveglow import WaveGlow
from text2speech_tpu.models.waveglow_fused import (
    infer_fused,
    infer_fused_int8,
    quantize_waveglow_int8,
)
from text2speech_tpu.ops.pallas.wn_block import BT, _fold_first_taps
from text2speech_tpu.ops.pallas.wn_block_int8 import (
    quantize_cols,
    quantize_rows,
    wn_layer_stream2_final_int8,
    wn_layer_stream2_first_int8,
    wn_layer_stream2_int8,
)

f32 = jnp.float32


def _emul_taps_q(qx, sx, qw, sw, d):
    """Padded-conv emulation of the kernel's int8 taps + row/col dequant."""
    B, T, C = qx.shape
    qxp = jnp.pad(qx, ((0, 0), (d, d), (0, 0)))
    sxp = jnp.pad(sx, ((0, 0), (d, d), (0, 0)))
    acc = None
    for t in range(3):
        dq = jnp.einsum(
            "btc,co->bto",
            qxp[:, t * d : t * d + T].astype(jnp.int32),
            qw[t].astype(jnp.int32),
        )
        term = dq.astype(f32) * sxp[:, t * d : t * d + T]
        acc = term if acc is None else acc + term
    return acc * sw


def _emul_cond_q(qspect, sspect, qw_cond, sw_cond, b_cond):
    dq = jnp.einsum(
        "btm,mo->bto", qspect.astype(jnp.int32), qw_cond.astype(jnp.int32)
    )
    return dq.astype(f32) * sspect * sw_cond + b_cond


def _emul_gate_rs_q(in_act, qw_rs, sw_rs, b_rs):
    C = in_act.shape[-1] // 2
    acts = jnp.tanh(in_act[..., :C]) * jax.nn.sigmoid(in_act[..., C:])
    qacts = jnp.round(acts * 127.0).astype(jnp.int8)
    dq = jnp.einsum(
        "btc,co->bto", qacts.astype(jnp.int32), qw_rs.astype(jnp.int32)
    )
    return dq.astype(f32) * (sw_rs * (1.0 / 127.0)) + b_rs


def _emul_quant_rows(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    return jnp.round(x / s).astype(jnp.int8), s


def _mask_valid(x, n_valid):
    T = x.shape[1]
    return x * (jnp.arange(T) < n_valid)[None, :, None].astype(x.dtype)


def _rand_layer_inputs(rng, B, T, C, M, n_valid):
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    qx, sx = quantize_rows(_mask_valid(x, n_valid))
    spect = jnp.asarray(rng.randn(B, T, M).astype(np.float32))
    qspect, sspect = quantize_rows(_mask_valid(spect, n_valid))
    return qx, sx, qspect, sspect


@pytest.mark.parametrize("d,n_valid", [(1, None), (4, 900)])
def test_int8_standard_layer_matches_emulation(d, n_valid):
    B, T, C, M = 1, 2 * BT, 256, 128
    nv = n_valid or T
    rng = np.random.RandomState(0)
    qx, sx, qspect, sspect = _rand_layer_inputs(rng, B, T, C, M, nv)
    qw_in, sw_in = quantize_cols(
        jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32) * 0.1)
    )
    b_in = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.1)
    qw_cond, sw_cond = quantize_cols(
        jnp.asarray(rng.randn(M, 2 * C).astype(np.float32) * 0.1)
    )
    b_cond = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.1)
    qw_rs, sw_rs = quantize_cols(
        jnp.asarray(rng.randn(C, 2 * C).astype(np.float32) * 0.1)
    )
    b_rs = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.1)
    skip_acc = jnp.asarray(
        rng.randn(B, T, C).astype(np.float32), jnp.bfloat16
    )

    qx_out, sx_out, skip_out = wn_layer_stream2_int8(
        qx, sx, qspect, sspect, qw_in, sw_in, b_in,
        qw_cond, sw_cond, b_cond, qw_rs, sw_rs, b_rs,
        skip_acc, dilation=d, n_valid=nv,
    )

    in_act = (
        _emul_taps_q(qx, sx, qw_in, sw_in, d)
        + b_in
        + _emul_cond_q(qspect, sspect, qw_cond, sw_cond, b_cond)
    )
    rs = _emul_gate_rs_q(in_act, qw_rs, sw_rs, b_rs)
    x_new = _mask_valid(qx.astype(f32) * sx + rs[..., :C], nv)
    qx_ref, sx_ref = _emul_quant_rows(x_new)
    skip_ref = skip_acc + rs[..., C:].astype(jnp.bfloat16)

    # int8 payloads must agree up to +-1 count on round-to-even knife edges
    # (f32 op-ordering differs between kernel and emulation)
    assert float(jnp.mean(jnp.abs(qx_out.astype(f32) - qx_ref.astype(f32)))) < 0.01
    assert int(jnp.max(jnp.abs(qx_out.astype(jnp.int32) - qx_ref.astype(jnp.int32)))) <= 1
    np.testing.assert_allclose(
        np.asarray(sx_out), np.asarray(sx_ref), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(skip_out, np.float32), np.asarray(skip_ref, np.float32),
        rtol=0, atol=0.09,
    )


def test_int8_first_layer_matches_emulation():
    B, T, C, M, n_half = 1, BT, 256, 128, 4
    nv = 700
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(
        _mask_valid(jnp.asarray(rng.randn(B, T, n_half), f32), nv),
        jnp.bfloat16,
    )
    _, _, qspect, sspect = _rand_layer_inputs(rng, B, T, C, M, nv)
    start_k = jnp.asarray(
        rng.randn(n_half, C).astype(np.float32) * 0.3, jnp.bfloat16
    )
    start_b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    w_in = jnp.asarray(
        rng.randn(3, C, 2 * C).astype(np.float32) * 0.1, jnp.bfloat16
    )
    b_in = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.1)
    qw_cond, sw_cond = quantize_cols(
        jnp.asarray(rng.randn(M, 2 * C).astype(np.float32) * 0.1)
    )
    b_cond = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.1)
    qw_rs, sw_rs = quantize_cols(
        jnp.asarray(rng.randn(C, 2 * C).astype(np.float32) * 0.1)
    )
    b_rs = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.1)

    qx_out, sx_out, skip_out = wn_layer_stream2_first_int8(
        x0, qspect, sspect, start_k, start_b, w_in, b_in,
        qw_cond, sw_cond, b_cond, qw_rs, sw_rs, b_rs,
        dilation=1, n_valid=nv,
    )

    # emulation: composed bf16 taps on x0, int8 cond/rs, quantized store
    wp, b_extra, b_edge = _fold_first_taps(start_k, start_b, w_in)
    wp = wp.astype(jnp.bfloat16)
    x0p = jnp.pad(x0, ((0, 0), (1, 1), (0, 0)))
    taps = None
    for t in range(3):
        term = jnp.einsum(
            "btc,co->bto", x0p[:, t : t + T], wp[t],
            preferred_element_type=f32,
        )
        taps = term if taps is None else taps + term
    in_act = taps + (b_in.astype(f32) + b_extra) + _emul_cond_q(
        qspect, sspect, qw_cond, sw_cond, b_cond
    )
    rows = jnp.arange(T)[None, :, None]
    in_act = in_act - jnp.where(rows < 1, b_edge[0], 0.0)
    in_act = in_act - jnp.where(rows >= nv - 1, b_edge[1], 0.0)
    rs = _emul_gate_rs_q(in_act, qw_rs, sw_rs, b_rs)
    xh = jnp.einsum(
        "btc,co->bto", x0, start_k, preferred_element_type=f32
    ) + start_b
    x_new = _mask_valid(xh + rs[..., :C], nv)
    qx_ref, sx_ref = _emul_quant_rows(x_new)

    assert int(jnp.max(jnp.abs(qx_out.astype(jnp.int32) - qx_ref.astype(jnp.int32)))) <= 1
    np.testing.assert_allclose(
        np.asarray(sx_out), np.asarray(sx_ref), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(skip_out, np.float32),
        np.asarray(rs[..., C:], np.float32),
        rtol=0, atol=0.09,
    )


def test_int8_final_layer_matches_emulation():
    B, T, C, M, E = 1, BT, 256, 128, 8
    nv = T
    d = 2
    rng = np.random.RandomState(2)
    qx, sx, qspect, sspect = _rand_layer_inputs(rng, B, T, C, M, nv)
    qw_in, sw_in = quantize_cols(
        jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32) * 0.1)
    )
    b_in = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.1)
    qw_cond, sw_cond = quantize_cols(
        jnp.asarray(rng.randn(M, 2 * C).astype(np.float32) * 0.1)
    )
    b_cond = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.1)
    w_rs = jnp.asarray(
        rng.randn(C, C).astype(np.float32) * 0.1, jnp.bfloat16
    )
    b_rs = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    w_end = jnp.asarray(
        rng.randn(C, E).astype(np.float32) * 0.1, jnp.bfloat16
    )
    b_end = jnp.asarray(rng.randn(E).astype(np.float32) * 0.1)
    skip_acc = jnp.asarray(
        rng.randn(B, T, C).astype(np.float32), jnp.bfloat16
    )

    wn_out = wn_layer_stream2_final_int8(
        qx, sx, qspect, sspect, qw_in, sw_in, b_in,
        qw_cond, sw_cond, b_cond, w_rs, b_rs, skip_acc, w_end, b_end,
        dilation=d, n_valid=nv,
    )

    in_act = (
        _emul_taps_q(qx, sx, qw_in, sw_in, d)
        + b_in
        + _emul_cond_q(qspect, sspect, qw_cond, sw_cond, b_cond)
    )
    acts = (
        jnp.tanh(in_act[..., :C]) * jax.nn.sigmoid(in_act[..., C:])
    ).astype(jnp.bfloat16)
    w_rs_eff = (w_rs.astype(f32) @ w_end.astype(f32)).astype(jnp.bfloat16)
    b_end_eff = b_rs @ w_end.astype(f32) + b_end
    ref = (
        jnp.einsum("btc,ce->bte", acts, w_rs_eff,
                   preferred_element_type=f32)
        + jnp.einsum("btc,ce->bte", skip_acc, w_end,
                     preferred_element_type=f32)
        + b_end_eff
    )
    np.testing.assert_allclose(
        np.asarray(wn_out), np.asarray(ref), rtol=0, atol=0.02
    )


# --- end-to-end fidelity ----------------------------------------------------

CFG = WaveGlowConfig(
    n_mel_channels=16, n_flows=4, n_group=8, n_early_every=2, n_early_size=2,
    wn_n_layers=3, wn_n_channels=32, wn_kernel_size=3,
    upsample_kernel=64, upsample_stride=16,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = WaveGlow(CFG)
    spect = jnp.zeros((1, CFG.n_mel_channels, 20))
    audio = jnp.zeros((1, 20 * CFG.upsample_stride))
    variables = model.init(jax.random.PRNGKey(0), spect, audio)
    rng = np.random.RandomState(1)
    variables = {"params": jax.tree.map(
        lambda x: x + 0.01 * rng.randn(*x.shape).astype(np.float32),
        variables["params"],
    )}
    return model, variables


def test_infer_fused_int8_tracks_f32(model_and_vars):
    model, variables = model_and_vars
    B, frames = 2, 24
    rng = np.random.RandomState(0)
    spect = jnp.asarray(
        rng.randn(B, CFG.n_mel_channels, frames).astype(np.float32)
    )
    gpf = CFG.upsample_stride // CFG.n_group
    noise = draw_noise(CFG, jax.random.PRNGKey(7), B, frames * gpf)

    ref = model.apply(
        variables, spect, None, 0.8, noise=noise, method=WaveGlow.infer
    )
    qparams = quantize_waveglow_int8(variables["params"], CFG)
    got = infer_fused_int8(qparams, CFG, spect, None, 0.8, noise=noise)

    assert got.shape == ref.shape
    err = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(
        np.asarray(ref)
    )
    # bf16 fused path lands ~0.3% relative; int8 must stay the same order
    bf16 = infer_fused(variables["params"], CFG, spect, None, 0.8,
                       noise=noise)
    err_bf16 = np.linalg.norm(np.asarray(bf16 - ref)) / np.linalg.norm(
        np.asarray(ref)
    )
    assert err < max(5 * err_bf16, 0.05), (err, err_bf16)


def test_infer_fused_int8_deterministic(model_and_vars):
    model, variables = model_and_vars
    spect = jnp.asarray(
        np.random.RandomState(3).randn(1, CFG.n_mel_channels, 12),
        jnp.float32,
    )
    qparams = quantize_waveglow_int8(variables["params"], CFG)
    a = infer_fused_int8(qparams, CFG, spect, jax.random.PRNGKey(5), 0.7)
    b = infer_fused_int8(qparams, CFG, spect, jax.random.PRNGKey(5), 0.7)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_partial_layer_matches_emulation():
    """TP partial kernel (wn_layer_stream2_partial_int8): each device's
    column/row slice must match a pure-jnp emulation of the identical
    quantized arithmetic — per-device scales, no res/skip bias (added
    post-psum by the caller)."""
    from text2speech_tpu.ops.pallas.wn_block_int8 import (
        wn_layer_stream2_partial_int8,
    )

    B, T, C, M, p = 1, BT, 256, 128, 4
    d = 2
    nv = 900
    s = C // p
    rng = np.random.RandomState(3)
    qx, sx, qspect, sspect = _rand_layer_inputs(rng, B, T, C, M, nv)
    w_in = rng.randn(3, C, 2 * C).astype(np.float32) * 0.1
    b_in = rng.randn(2 * C).astype(np.float32) * 0.1
    w_cond = rng.randn(M, 2 * C).astype(np.float32) * 0.1
    b_cond = rng.randn(2 * C).astype(np.float32) * 0.1
    w_rs = rng.randn(C, 2 * C).astype(np.float32) * 0.1

    for i in (0, 2):  # two representative device slices
        cols = np.r_[i * s : (i + 1) * s, C + i * s : C + (i + 1) * s]
        qw_in, sw_in = quantize_cols(jnp.asarray(w_in[:, :, cols]))
        qw_cond, sw_cond = quantize_cols(jnp.asarray(w_cond[:, cols]))
        qw_rs, sw_rs = quantize_cols(
            jnp.asarray(w_rs[i * s : (i + 1) * s])
        )
        b_in_l = jnp.asarray(b_in[cols])
        b_cond_l = jnp.asarray(b_cond[cols])

        got = wn_layer_stream2_partial_int8(
            qx, sx, qspect, sspect, qw_in, sw_in, b_in_l,
            qw_cond, sw_cond, b_cond_l, qw_rs, sw_rs,
            dilation=d, n_valid=nv,
        )

        in_act = (
            _emul_taps_q(qx, sx, qw_in, sw_in, d)
            + b_in_l
            + _emul_cond_q(qspect, sspect, qw_cond, sw_cond, b_cond_l)
        )
        Cp = in_act.shape[-1] // 2
        acts = jnp.tanh(in_act[..., :Cp]) * jax.nn.sigmoid(in_act[..., Cp:])
        qacts = jnp.round(acts * 127.0).astype(jnp.int8)
        dq = jnp.einsum(
            "btc,co->bto", qacts.astype(jnp.int32), qw_rs.astype(jnp.int32)
        )
        ref = _mask_valid(dq.astype(f32) * (sw_rs * (1.0 / 127.0)), nv)

        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=0.09
        )
