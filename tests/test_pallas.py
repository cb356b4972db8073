"""Pallas kernel tests: interpret-mode parity of the fused gated activation
(forward + VJP) against the jnp reference."""

import numpy as np

import jax
import jax.numpy as jnp

from text2speech_tpu.ops.pallas import gated


def test_gated_reference_math():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 8, 512).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 8, 512).astype(np.float32))
    out = np.asarray(gated.gated_activation_reference(a, b))
    x = np.asarray(a) + np.asarray(b)
    want = np.tanh(x[..., :256]) * (1 / (1 + np.exp(-x[..., 256:])))
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_gated_pallas_interpret_matches_reference(monkeypatch):
    from jax.experimental import pallas as pl

    # run the pallas kernels in interpreter mode on CPU
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(2, 300, 512).astype(np.float32))  # T % BLOCK_T != 0
    b = jnp.asarray(rng.randn(2, 300, 512).astype(np.float32))
    out = np.asarray(gated.gated_activation_pallas(a, b))
    want = np.asarray(gated.gated_activation_reference(a, b))
    np.testing.assert_allclose(out, want, atol=1e-6)

    # VJP parity
    g = jnp.ones_like(out)
    da_p, db_p = jax.vjp(gated.gated_activation_pallas, a, b)[1](jnp.asarray(g))
    da_r, db_r = jax.vjp(gated.gated_activation_reference, a, b)[1](jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(da_p), np.asarray(da_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_r), atol=1e-5)


def test_fused_infer_matches_exact_interior():
    """infer_fused (pallas serving path, interpret mode on CPU) equals the
    exact unfused infer away from the tail halo (sigma=0, fp32)."""
    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.models.waveglow import WaveGlow
    from text2speech_tpu.models.waveglow_fused import infer_fused

    cfg = WaveGlowConfig(
        n_mel_channels=8, n_flows=4, n_group=8, n_early_every=2,
        n_early_size=2, wn_n_layers=3, wn_n_channels=32,
        upsample_kernel=64, upsample_stride=16,
    )
    model = WaveGlow(cfg)
    rng = np.random.RandomState(0)
    spect = jnp.asarray(rng.randn(2, 8, 700).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), spect, jnp.zeros((2, 700 * 16))
    )
    params = jax.tree.map(
        lambda x: x + 0.01 * np.random.RandomState(1).randn(*x.shape).astype(
            np.float32),
        variables["params"],
    )
    exact = model.apply(
        {"params": params}, spect, jax.random.PRNGKey(5), 0.0,
        method=WaveGlow.infer,
    )
    fused = infer_fused(params, cfg, spect, jax.random.PRNGKey(5), 0.0,
                        compute_dtype=jnp.float32)
    n = min(exact.shape[1], fused.shape[1])
    cutoff = n - 129 * cfg.n_group  # tail halo may differ (padded synthesis)
    np.testing.assert_allclose(
        np.asarray(exact)[:, :cutoff], np.asarray(fused)[:, :cutoff], atol=1e-5
    )


def test_wn_stream_long_sequence_and_max_dilation():
    """Streaming ring kernel parity at 6 tiles and the model's max dilation
    (d=128), exercising ring reuse across many grid steps."""
    from text2speech_tpu.ops.pallas import wn_block as wb
    from text2speech_tpu.ops.pallas import wn_block_padded as wbp

    rng = np.random.RandomState(3)
    B, C, M = 2, 64, 48
    T = 6 * wb.BT
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32)) * 0.1
    sp = jnp.asarray(rng.randn(B, T, M).astype(np.float32)) * 0.1
    w_in = jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32)) * 0.05
    b_in = jnp.asarray(rng.randn(2 * C).astype(np.float32)) * 0.05
    w_c = jnp.asarray(rng.randn(M, 2 * C).astype(np.float32)) * 0.05
    b_c = jnp.asarray(rng.randn(2 * C).astype(np.float32)) * 0.05
    w_rs = jnp.asarray(rng.randn(C, 2 * C).astype(np.float32)) * 0.05
    b_rs = jnp.asarray(rng.randn(2 * C).astype(np.float32)) * 0.05
    for d in (1, 128):
        xp = wbp.pad_tiles(x)
        spp = wbp.pad_tiles(sp)
        acc = jnp.asarray(rng.randn(*xp.shape).astype(np.float32)) * 0.1
        xa, sa = wbp.wn_layer_spect(xp, spp, w_in, b_in, w_c, b_c,
                                   w_rs, b_rs, acc, d)
        xb, sb = wbp.wn_layer_stream(xp, spp, w_in, b_in, w_c, b_c,
                                    w_rs, b_rs, acc, d)
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=1e-5)


def test_wn_stream_final_end_projection_parity():
    """Final-layer kernel with folded end projection == streaming kernel +
    explicit end matmul on the real (unpadded, valid) region."""
    from text2speech_tpu.ops.pallas import wn_block as wb
    from text2speech_tpu.ops.pallas import wn_block_padded as wbp

    rng = np.random.RandomState(4)
    B, C, M, E = 2, 64, 48, 8
    T = 4 * wb.BT
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32)) * 0.1
    sp = jnp.asarray(rng.randn(B, T, M).astype(np.float32)) * 0.1
    w_in = jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32)) * 0.05
    b_in = jnp.asarray(rng.randn(2 * C).astype(np.float32)) * 0.05
    w_c = jnp.asarray(rng.randn(M, 2 * C).astype(np.float32)) * 0.05
    b_c = jnp.asarray(rng.randn(2 * C).astype(np.float32)) * 0.05
    w_rs = jnp.asarray(rng.randn(C, C).astype(np.float32)) * 0.05
    b_rs = jnp.asarray(rng.randn(C).astype(np.float32)) * 0.05
    w_end = jnp.asarray(rng.randn(C, E).astype(np.float32)) * 0.05
    b_end = jnp.asarray(rng.randn(E).astype(np.float32)) * 0.05
    for d, n_valid in ((1, T), (64, T - 100)):
        xp = wbp.pad_tiles(x)
        spp = wbp.pad_tiles(sp)
        acc = jnp.asarray(rng.randn(*xp.shape).astype(np.float32)) * 0.1
        _, skip = wbp.wn_layer_stream(
            xp, spp, w_in, b_in, w_c, b_c, w_rs, b_rs, acc, d,
            n_valid=n_valid,
        )
        want = jnp.einsum("btc,ce->bte", skip, w_end) + b_end
        got = wbp.wn_layer_stream_final(
            xp, spp, w_in, b_in, w_c, b_c, w_rs, b_rs, acc,
            w_end, b_end, d, n_valid=n_valid,
        )
        assert got.shape == (B, xp.shape[1], E)
        np.testing.assert_allclose(
            np.asarray(wbp.unpad_tiles(got))[:, :n_valid],
            np.asarray(wbp.unpad_tiles(want))[:, :n_valid],
            atol=1e-4,
        )


def test_wn_stream2_unpadded_matches_padded():
    """Unpadded streaming kernels (in-kernel edge zero-padding, no pad
    tiles) == padded streaming kernels on the real region, both rs widths,
    d=1 and the model's max d=128, including a partial final tile."""
    from text2speech_tpu.ops.pallas import wn_block as wb
    from text2speech_tpu.ops.pallas import wn_block_padded as wbp

    rng = np.random.RandomState(5)
    B, C, M, E = 2, 64, 48, 8
    T = 3 * wb.BT
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32)) * 0.1
    sp = jnp.asarray(rng.randn(B, T, M).astype(np.float32)) * 0.1
    w_in = jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32)) * 0.05
    b_in = jnp.asarray(rng.randn(2 * C).astype(np.float32)) * 0.05
    w_c = jnp.asarray(rng.randn(M, 2 * C).astype(np.float32)) * 0.05
    b_c = jnp.asarray(rng.randn(2 * C).astype(np.float32)) * 0.05
    w_end = jnp.asarray(rng.randn(C, E).astype(np.float32)) * 0.05
    b_end = jnp.asarray(rng.randn(E).astype(np.float32)) * 0.05
    for d, n_valid in ((1, T), (128, T - 200)):
        # zero rows past n_valid like the serving path's tile mask does
        mask = (np.arange(T) < n_valid)[None, :, None]
        xm = x * mask
        spm = sp * mask
        acc_np = rng.randn(B, T, C).astype(np.float32) * 0.1 * mask
        for rs_out in (2 * C, C):
            w_rs = jnp.asarray(rng.randn(C, rs_out).astype(np.float32)) * 0.05
            b_rs = jnp.asarray(rng.randn(rs_out).astype(np.float32)) * 0.05
            xp = wbp.pad_tiles(xm)
            spp = wbp.pad_tiles(spm)
            xa, sa = wbp.wn_layer_stream(
                xp, spp, w_in, b_in, w_c, b_c, w_rs, b_rs,
                wbp.pad_tiles(jnp.asarray(acc_np)), d, n_valid=n_valid,
            )
            xb, sb = wb.wn_layer_stream2(
                xm, spm, w_in, b_in, w_c, b_c, w_rs, b_rs,
                jnp.asarray(acc_np), d, n_valid=n_valid,
            )
            np.testing.assert_allclose(
                np.asarray(wbp.unpad_tiles(xa)), np.asarray(xb), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(wbp.unpad_tiles(sa))[:, :n_valid],
                np.asarray(sb)[:, :n_valid], atol=1e-5,
            )
        # final-layer variant
        w_rs = jnp.asarray(rng.randn(C, C).astype(np.float32)) * 0.05
        b_rs = jnp.asarray(rng.randn(C).astype(np.float32)) * 0.05
        want = wbp.wn_layer_stream_final(
            wbp.pad_tiles(xm), wbp.pad_tiles(spm), w_in, b_in, w_c, b_c,
            w_rs, b_rs, wbp.pad_tiles(jnp.asarray(acc_np)), w_end, b_end, d,
            n_valid=n_valid,
        )
        got = wb.wn_layer_stream2_final(
            xm, spm, w_in, b_in, w_c, b_c, w_rs, b_rs,
            jnp.asarray(acc_np), w_end, b_end, d, n_valid=n_valid,
        )
        np.testing.assert_allclose(
            np.asarray(wbp.unpad_tiles(want))[:, :n_valid],
            np.asarray(got)[:, :n_valid], atol=1e-4,
        )


def test_wn_stream2_first_composed_taps_parity():
    """Fused start+layer-0 kernel == start projection followed by the
    standard unpadded streaming layer with a zero skip accumulator —
    including sequence edges (folded-bias suppression) and a partial
    final tile."""
    from text2speech_tpu.ops.pallas import wn_block as wb
    from text2speech_tpu.ops.pallas import wn_block_padded as wbp

    rng = np.random.RandomState(6)
    B, C, M, n_half = 2, 64, 48, 4
    T = 3 * wb.BT
    for n_valid in (T, T - 300):
        mask = (np.arange(T) < n_valid)[None, :, None]
        x0 = jnp.asarray((rng.randn(B, T, n_half) * 0.3 * mask).astype(np.float32))
        sp = jnp.asarray((rng.randn(B, T, M) * 0.1 * mask).astype(np.float32))
        start_k = jnp.asarray(rng.randn(n_half, C).astype(np.float32) * 0.2)
        start_b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
        w_in = jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32) * 0.05)
        b_in = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.05)
        w_c = jnp.asarray(rng.randn(M, 2 * C).astype(np.float32) * 0.05)
        b_c = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.05)
        w_rs = jnp.asarray(rng.randn(C, 2 * C).astype(np.float32) * 0.05)
        b_rs = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.05)

        xh = (jnp.einsum("btn,nc->btc", x0, start_k) + start_b) * mask
        want_x, want_s = wb.wn_layer_stream2(
            xh, sp, w_in, b_in, w_c, b_c, w_rs, b_rs,
            jnp.zeros_like(xh), 1, n_valid=n_valid,
        )
        got_x, got_s = wb.wn_layer_stream2_first(
            x0, sp, start_k, start_b, w_in, b_in, w_c, b_c, w_rs, b_rs,
            1, n_valid=n_valid,
        )
        np.testing.assert_allclose(
            np.asarray(got_x), np.asarray(want_x), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(got_s)[:, :n_valid], np.asarray(want_s)[:, :n_valid],
            atol=5e-4,
        )


def test_fused_infer_composed_cond_matches_kernel_cond():
    """Mel-level composed conditioning (precompute_composed_cond + dcond
    kernels) == the in-kernel spect projection path, fp32 interpret mode."""
    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.models.waveglow import WaveGlow
    from text2speech_tpu.models.waveglow_fused import (
        infer_fused,
        precompute_composed_cond,
    )

    cfg = WaveGlowConfig(
        n_mel_channels=8, n_flows=3, n_group=8, n_early_every=2,
        n_early_size=2, wn_n_layers=3, wn_n_channels=32,
        upsample_kernel=64, upsample_stride=16,
    )
    model = WaveGlow(cfg)
    rng = np.random.RandomState(0)
    frames = 700  # partial final tile at BT=512 (Tg = 1400)
    spect = jnp.asarray(rng.randn(2, 8, frames).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), spect, jnp.zeros((2, frames * 16))
    )
    params = jax.tree.map(
        lambda x: x + 0.01 * np.random.RandomState(1).randn(*x.shape).astype(
            np.float32),
        variables["params"],
    )
    want = infer_fused(params, cfg, spect, jax.random.PRNGKey(5), 0.7,
                       compute_dtype=jnp.float32)
    cc = precompute_composed_cond(params, cfg, compute_dtype=jnp.float32)
    got = infer_fused(params, cfg, spect, jax.random.PRNGKey(5), 0.7,
                      compute_dtype=jnp.float32, composed_cond=cc)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_wn_backward_probe_matches_conv_vjp():
    """The backward-probe kernel (VERDICT r3 #8: measure, don't estimate)
    reproduces jax.vjp of the shipping lax.conv training lowering: dx via
    transposed taps, dW via VMEM-accumulated per-tile outer products —
    across dilations incl. the d=128 top of the WN ladder."""
    from text2speech_tpu.ops.pallas.wn_backward import (
        conv_k3_bwd_pallas, conv_k3_fwd_xla)
    from text2speech_tpu.ops.pallas.wn_block import BT
    from text2speech_tpu.ops.pallas.wn_block_padded import pad_tiles

    rng = np.random.RandomState(3)
    B, T, C = 2, 2 * BT, 16
    for d in (1, 4, 128, BT):
        x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
        w = jnp.asarray(0.3 * rng.randn(3, C, 2 * C).astype(np.float32))
        g = jnp.asarray(rng.randn(B, T, 2 * C).astype(np.float32))

        _, vjp = jax.vjp(lambda x_, w_: conv_k3_fwd_xla(x_, w_, d), x, w)
        dx_ref, dw_ref = vjp(g)

        dx, dw = conv_k3_bwd_pallas(pad_tiles(x), pad_tiles(g), w, d)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                                   atol=2e-4, rtol=1e-4, err_msg=f"dx d={d}")
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                                   atol=2e-3, rtol=1e-4, err_msg=f"dw d={d}")
