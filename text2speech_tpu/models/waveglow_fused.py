"""Fused-kernel WaveGlow inference (serving path).

Pure function over the model's params tree: the 96 WN coupling layers run
through the fused streaming Pallas layer kernel (:mod:`..ops.pallas.wn_block`
``wn_layer_stream`` — dilated-tap matmuls + in-kernel conditioning projection
+ gated activation + res/skip matmul + in-place skip accumulation in one VMEM
pass, reading each hidden tile from HBM exactly once via a 2-tile ring),
everything else (upsample, invertible 1x1, affine coupling) as plain jnp.
Weight-norm is folded on the fly.

Time axis is tiled: T_groups is zero-extended to a multiple of the kernel
tile (BT=512); the streaming kernels synthesize the conv edge zero-padding
in-kernel (zero-initialized ring slot on the left, masked lookahead on the
right), so no grid steps or HBM writes are spent on pad tiles.
Synthesis within the true length is equivalent to running the unfused model
on the zero-extended mel, so the last <=128 groups near the true end can
differ marginally from exact-length unfused inference (standard padded-batch
edge behavior); the rest matches to bf16 precision.

Forward/training keeps the XLA composite (this kernel defines no VJP).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# VPU/MXU-overlap experiment (see wn_block._kernel_stream2 row_split):
# compute the coupling in 2 row sub-blocks so one half's gating overlaps the
# other's matmuls.  Opt-in for A/B benching.
_ROW_SPLIT = 2 if os.environ.get("T2S_ROW_SPLIT2") else 1

from ..config import WaveGlowConfig
from ..ops.pallas.wn_block import (
    BT,
    wn_layer_stream2,
    wn_layer_stream2_final,
    wn_layer_stream2_first,
)
from ..ops.pallas.wn_block_dcond import (
    wn_layer_stream2_dcond,
    wn_layer_stream2_final_dcond,
    wn_layer_stream2_first_dcond,
)


def precompute_composed_cond(params: dict, cfg: WaveGlowConfig,
                             compute_dtype=jnp.bfloat16) -> dict:
    """One-time serving weight transform: collapse upsample ∘ grouping ∘
    per-flow conditioning projection into per-phase MEL-level weights.

    The grouped conditioning vector of audio-group g is a linear function of
    only r (=upsample_kernel/stride = 4) mel frames, so the per-layer
    projection's contraction shrinks from n_mel*n_group = 640 dims to
    r*n_mel = 320 — half the conditioning FLOPs (~12% of all WN FLOPs) —
    at the cost of phase-expanded weights (one [r, n_mel, 2C·L] block per
    of the stride/n_group = 32 phases; ~170 MB bf16 per flow at reference
    size).  Derivation: with u = g // P, ph = g %% P (P = stride/n_group),

        cond[g] = Σ_q mel[u-q] · Wc[q, ph] + b_eff,
        Wc[q, ph, mi, o] = Σ_{mo, j} up_kernel[(q·P + ph)·G + j... ] — see
        the reshape below; b_eff folds the upsample bias through w_cond.

    Do this once per checkpoint (outside jit) and pass the result to
    :func:`infer_fused` as ``composed_cond``."""
    k, s = cfg.upsample_kernel, cfg.upsample_stride
    r, G = k // s, cfg.n_group
    P = s // G
    M = cfg.n_mel_channels
    up_k = params["upsample"]["kernel"]          # [k, M, M]
    up_b = params["upsample"]["bias"]
    kq5 = up_k.reshape(r, P, G, M, M).astype(jnp.float32)  # [q, ph, j, mi, mo]
    out = {}
    for k_flow in range(cfg.n_flows):
        cond_k, cond_b = _fold(params[f"wn{k_flow}"]["cond"])
        O = cond_k.shape[-1]
        wc3 = cond_k[0].reshape(M, G, O).astype(jnp.float32)  # [mo, j, o]
        Wc = jnp.einsum("qpjim,mjo->qpio", kq5, wc3)
        b_eff = cond_b.astype(jnp.float32) + jnp.einsum(
            "m,mjo->o", up_b.astype(jnp.float32), wc3
        )
        out[k_flow] = (Wc.astype(compute_dtype), b_eff)
    return out


def _fold(p):
    """(v, g[, bias]) weight-norm conv params -> (kernel [k,in,out], bias)."""
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
    kernel = v / norm * g[None, None, :]
    bias = p.get("bias")
    return kernel, bias


def quantize_waveglow_int8(params: dict, cfg: WaveGlowConfig,
                           compute_dtype=jnp.bfloat16) -> dict:
    """One-time serving weight transform for :func:`infer_fused_int8`:
    fold weight-norm, then quantize the three large WN matmul families
    (dilated taps, conditioning projections, res/skip) to int8 with static
    per-output-channel scales.  What stays high precision — and why:

    * layer 0's dilated conv (``w_in0``): composed onto the rank-n_half
      start projection inside the first kernel (K ≤ 4 — negligible MXU);
    * the last layer's res/skip + end projection: N = E ≤ 8 after the
      ``fold_rs`` collapse, and the (log_s, b) coupling terms want full
      precision;
    * all biases (f32), upsample, invertible 1x1 convs.

    Run once per checkpoint OUTSIDE jit (like
    :func:`precompute_composed_cond`) and pass the result as a jit
    ARGUMENT."""
    from ..ops.pallas.wn_block_int8 import quantize_cols

    C, L = cfg.wn_n_channels, cfg.wn_n_layers
    out: dict = {
        "upsample": {
            "kernel": params["upsample"]["kernel"].astype(compute_dtype),
            "bias": params["upsample"]["bias"].astype(jnp.float32),
        }
    }
    for k in range(cfg.n_flows):
        out[f"convinv{k}"] = {
            "W": params[f"convinv{k}"]["W"].astype(jnp.float32)
        }
        wn = params[f"wn{k}"]
        start_k, start_b = _fold(wn["start"])
        cond_k, cond_b = _fold(wn["cond"])
        w_in0, b_in0 = _fold(wn["in0"])
        blk: dict = {
            "start_k": start_k[0].astype(compute_dtype),
            "start_b": start_b.astype(jnp.float32),
            "w_in0": w_in0.astype(compute_dtype),
            "b_in0": b_in0.astype(jnp.float32),
        }
        for li in range(L):
            ck = cond_k[0, :, 2 * C * li : 2 * C * (li + 1)]
            cb = cond_b[2 * C * li : 2 * C * (li + 1)]
            q, s = quantize_cols(ck)
            blk[f"cond{li}"] = {"q": q, "s": s, "b": cb.astype(jnp.float32)}
            if li > 0:
                w_in, b_in = _fold(wn[f"in{li}"])
                q, s = quantize_cols(w_in)
                blk[f"in{li}"] = {
                    "q": q, "s": s, "b": b_in.astype(jnp.float32)
                }
            w_rs, b_rs = _fold(wn[f"res_skip{li}"])
            if li < L - 1:
                q, s = quantize_cols(w_rs[0])
                blk[f"rs{li}"] = {
                    "q": q, "s": s, "b": b_rs.astype(jnp.float32)
                }
            else:
                blk["rs_last"] = {
                    "w": w_rs[0].astype(compute_dtype),
                    "b": b_rs.astype(jnp.float32),
                }
        blk["end"] = {
            "w": wn["end"]["kernel"][0].astype(compute_dtype),
            "b": wn["end"]["bias"].astype(jnp.float32),
        }
        out[f"wn{k}"] = blk
    return out


def infer_fused_int8(
    qparams: dict,
    cfg: WaveGlowConfig,
    spect: jnp.ndarray,          # [B, n_mel, frames]
    key: jax.Array | None,
    sigma: float = 1.0,
    compute_dtype=jnp.bfloat16,
    noise: tuple[jnp.ndarray, ...] | None = None,
) -> jnp.ndarray:
    """mel -> audio with int8 WN layers (:mod:`..ops.pallas.wn_block_int8`).

    ``qparams`` comes from :func:`quantize_waveglow_int8`.  Same contract
    as :func:`infer_fused` (explicit ``noise`` supported); the coupling
    arithmetic, invertible 1x1 convs, upsample and noise handling are the
    bf16/f32 path unchanged — only the WN coupling stacks run quantized.
    Accuracy: per-row dynamic activation scales + per-channel weight
    scales; measured audio SNR vs the f32 reference path is asserted in
    ``tests/test_int8_vocoder.py``."""
    from ..ops.pallas.wn_block_int8 import (
        quantize_rows,
        wn_layer_stream2_final_int8,
        wn_layer_stream2_first_int8,
        wn_layer_stream2_int8,
    )

    B = spect.shape[0]
    L = cfg.wn_n_layers
    k, s = cfg.upsample_kernel, cfg.upsample_stride
    r = k // s
    G = cfg.n_group
    F = spect.shape[2]
    assert L >= 2, "int8 path needs the first/final kernel split"

    # --- upsample + group + tile pad (as infer_fused) ----------------------
    up_kernel = qparams["upsample"]["kernel"]
    up_bias = qparams["upsample"]["bias"]
    x = spect.transpose(0, 2, 1).astype(compute_dtype)
    kq = up_kernel.reshape(r, s, up_kernel.shape[1], up_kernel.shape[2])
    y = jnp.einsum("bti,qpio->btqpo", x, kq)
    out = jnp.zeros((B, F + r - 1, s, y.shape[-1]), y.dtype)
    for q in range(r):
        out = out.at[:, q : q + F].add(y[:, :, q])
    up = out.reshape(B, (F + r - 1) * s, -1) + up_bias.astype(y.dtype)
    up = up[:, : up.shape[1] - (k - s)]
    Tg = up.shape[1] // G
    spect_g = up[:, : Tg * G].reshape(B, Tg, G, -1)
    spect_g = spect_g.transpose(0, 1, 3, 2).reshape(B, Tg, -1)

    Tp = max(_round_up(Tg, BT), BT)
    spect_p = jnp.concatenate(
        [spect_g, jnp.zeros((B, Tp - Tg, spect_g.shape[-1]), spect_g.dtype)],
        axis=1,
    )
    # ONE per-row quantization of the grouped conditioning serves all
    # L * n_flows layers
    qspect, sspect = quantize_rows(spect_p)
    tile_mask = jnp.zeros((1, Tp, 1), compute_dtype).at[:, :Tg].set(1.0)

    noise_iter = iter(noise) if noise is not None else None

    def next_noise(shape):
        nonlocal key
        if noise_iter is not None:
            z = next(noise_iter, None)
            assert z is not None and z.shape == (B, Tg, shape[-1]), (
                "noise tuple must match draw_noise(cfg, key, B, Tg) order"
            )
            pad = jnp.zeros((B, Tp - Tg, shape[-1]), compute_dtype)
            return jnp.concatenate([z.astype(compute_dtype), pad], axis=1)
        if key is None:
            key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, shape, compute_dtype)

    audio = sigma * next_noise((B, Tp, cfg.n_remaining_channels))
    audio = audio * tile_mask

    for k_flow in reversed(range(cfg.n_flows)):
        wn = qparams[f"wn{k_flow}"]
        n_half = audio.shape[-1] // 2
        x0 = audio[..., :n_half]
        x1 = audio[..., n_half:]

        qx, sx, skip_total = wn_layer_stream2_first_int8(
            x0, qspect, sspect,
            wn["start_k"], wn["start_b"], wn["w_in0"], wn["b_in0"],
            wn["cond0"]["q"], wn["cond0"]["s"], wn["cond0"]["b"],
            wn["rs0"]["q"], wn["rs0"]["s"], wn["rs0"]["b"],
            dilation=1, n_valid=Tg,
        )
        for li in range(1, L - 1):
            qx, sx, skip_total = wn_layer_stream2_int8(
                qx, sx, qspect, sspect,
                wn[f"in{li}"]["q"], wn[f"in{li}"]["s"], wn[f"in{li}"]["b"],
                wn[f"cond{li}"]["q"], wn[f"cond{li}"]["s"],
                wn[f"cond{li}"]["b"],
                wn[f"rs{li}"]["q"], wn[f"rs{li}"]["s"], wn[f"rs{li}"]["b"],
                skip_total, dilation=2 ** li, n_valid=Tg,
            )
        li = L - 1
        wn_out = wn_layer_stream2_final_int8(
            qx, sx, qspect, sspect,
            wn[f"in{li}"]["q"], wn[f"in{li}"]["s"], wn[f"in{li}"]["b"],
            wn[f"cond{li}"]["q"], wn[f"cond{li}"]["s"], wn[f"cond{li}"]["b"],
            wn["rs_last"]["w"], wn["rs_last"]["b"],
            skip_total, wn["end"]["w"], wn["end"]["b"],
            dilation=2 ** li, n_valid=Tg,
        )
        b_term = wn_out[..., :n_half]
        s_term = wn_out[..., n_half:]
        x1 = ((x1.astype(jnp.float32) - b_term) * jnp.exp(-s_term)).astype(
            compute_dtype
        )
        audio = jnp.concatenate([x0, x1], axis=-1) * tile_mask

        W_inv = jnp.linalg.inv(qparams[f"convinv{k_flow}"]["W"])
        audio = (audio.astype(jnp.float32) @ W_inv.T).astype(compute_dtype)

        if k_flow % cfg.n_early_every == 0 and k_flow > 0:
            z = sigma * next_noise((B, Tp, cfg.n_early_size))
            audio = jnp.concatenate([z * tile_mask, audio], axis=-1)

    real = audio[:, :Tg]
    return real.reshape(B, Tg * cfg.n_group).astype(jnp.float32)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def infer_fused(
    params: dict,
    cfg: WaveGlowConfig,
    spect: jnp.ndarray,          # [B, n_mel, frames]
    key: jax.Array | None,
    sigma: float = 1.0,
    compute_dtype=jnp.bfloat16,
    noise: tuple[jnp.ndarray, ...] | None = None,
    composed_cond: dict | None = None,
) -> jnp.ndarray:
    """mel -> audio [B, samples] with fused WN layers.

    ``noise`` optionally supplies the standard-normal draws explicitly
    (same contract as ``WaveGlow.infer`` / :func:`..models.chunked.draw_noise`:
    one [B, T_groups, C] array per consumption point at the TRUE length);
    they are zero-extended to the tile-rounded length internally.  Used by
    chunked long-form synthesis so windows see consistent overlap noise.

    ``composed_cond`` (from :func:`precompute_composed_cond`) switches the
    conditioning to the mel-level composed path: the explicit upsample and
    the in-kernel 640-dim projections disappear; each flow materializes its
    cond_all with half the FLOPs and the layer kernels read 2C slices of it
    directly.  CAUTION: when jitting a wrapper, pass ``composed_cond``
    through as a jit ARGUMENT — closing over it bakes ~2 GB of
    phase-expanded weights into the HLO as constants (CLAUDE.md gotcha #2;
    on this rig the remote-compile payload then breaks the tunnel)."""
    B = spect.shape[0]
    L, C = cfg.wn_n_layers, cfg.wn_n_channels
    k, s = cfg.upsample_kernel, cfg.upsample_stride
    r = k // s
    G = cfg.n_group
    F = spect.shape[2]

    if composed_cond is None:
        # --- upsample (subpixel matmul, = SubpixelUpsample) --------------
        up_kernel = params["upsample"]["kernel"].astype(compute_dtype)
        up_bias = params["upsample"]["bias"]
        x = spect.transpose(0, 2, 1).astype(compute_dtype)   # [B, F, n_mel]
        kq = up_kernel.reshape(r, s, up_kernel.shape[1], up_kernel.shape[2])
        y = jnp.einsum("bti,qpio->btqpo", x, kq)
        out = jnp.zeros((B, F + r - 1, s, y.shape[-1]), y.dtype)
        for q in range(r):
            out = out.at[:, q : q + F].add(y[:, :, q])
        up = out.reshape(B, (F + r - 1) * s, -1) + up_bias.astype(y.dtype)
        cut = k - s
        up = up[:, : up.shape[1] - cut]                  # [B, T_samples, n_mel]

        # --- group + pad to tile multiple ---------------------------------
        Tg = up.shape[1] // G
        spect_g = up[:, : Tg * G].reshape(B, Tg, G, -1)
        spect_g = spect_g.transpose(0, 1, 3, 2).reshape(B, Tg, -1)
        mel_sh = None
    else:
        # composed path: no explicit upsample; cond comes straight from the
        # mel window stack (see precompute_composed_cond)
        Tg = F * s // G
        spect_g = None
        melT = spect.transpose(0, 2, 1).astype(compute_dtype)   # [B, F, M]
        mel_sh = jnp.stack(
            [jnp.pad(melT, ((0, 0), (q, 0), (0, 0)))[:, :F] for q in range(r)],
            axis=2,
        )                                                       # [B, F, r, M]

    # Unpadded tile layout: the streaming kernels synthesize the conv zero
    # padding at the sequence edges themselves (zero-initialized ring slot /
    # masked lookahead), so no grid steps are spent on zero pad tiles.
    Tp = max(_round_up(Tg, BT), BT)
    P = s // G
    if spect_g is not None:
        ext = jnp.zeros((B, Tp - Tg, spect_g.shape[-1]), spect_g.dtype)
        spect_p = jnp.concatenate([spect_g, ext], axis=1)        # [B, Tp, 640]
    else:
        spect_p = None

    # valid-frame mask: only the REAL Tg frames, not the tile-rounding pad —
    # pad frames must stay zero so halo reads match the reference's implicit
    # conv zero-padding (glow.py:136-137)
    tile_mask = jnp.zeros((1, Tp, 1), compute_dtype).at[:, :Tg].set(1.0)

    # --- initial noise -----------------------------------------------------
    noise_iter = iter(noise) if noise is not None else None

    def next_noise(shape):
        nonlocal key
        if noise_iter is not None:
            z = next(noise_iter, None)
            assert z is not None and z.shape == (B, Tg, shape[-1]), (
                "noise tuple must match draw_noise(cfg, key, B, Tg) order"
            )
            pad = jnp.zeros((B, Tp - Tg, shape[-1]), compute_dtype)
            return jnp.concatenate([z.astype(compute_dtype), pad], axis=1)
        if key is None:
            key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, shape, compute_dtype)

    audio = sigma * next_noise((B, Tp, cfg.n_remaining_channels))
    audio = audio * tile_mask

    for k_flow in reversed(range(cfg.n_flows)):
        wn = params[f"wn{k_flow}"]
        n_half = audio.shape[-1] // 2
        x0 = audio[..., :n_half]
        x1 = audio[..., n_half:]

        start_k, start_b = _fold(wn["start"])
        if composed_cond is not None:
            # materialize this flow's cond_all [B, Tp, 2C*L] from the mel
            # window stack (half the conditioning FLOPs of the in-kernel
            # projection; one flow's buffer alive at a time)
            Wc, b_eff = composed_cond[k_flow]
            # MXU accumulates in f32 internally; keep the (large) output in
            # compute dtype to halve its HBM footprint
            cond_f = jnp.einsum(
                "bfqi,qpio->bfpo", mel_sh, Wc.astype(compute_dtype)
            ) + b_eff.astype(compute_dtype)
            cond_all = cond_f.reshape(B, F * P, -1)
            cond_all = jnp.concatenate(
                [cond_all,
                 jnp.zeros((B, Tp - Tg, cond_all.shape[-1]), compute_dtype)],
                axis=1,
            )
        else:
            cond_k, cond_b = _fold(wn["cond"])   # [1, M, 2C*L], [2C*L]

        if L >= 2:
            # fused start + layer 0: the hidden input has rank <= n_half, so
            # the K=C dilated taps collapse onto x0 (K=n_half) — ~8 of 21
            # MXU passes of a standard layer, and no xh HBM round-trip
            w_in0, b_in0 = _fold(wn["in0"])
            w_rs0, b_rs0 = _fold(wn["res_skip0"])
            if composed_cond is not None:
                xh, skip_total = wn_layer_stream2_first_dcond(
                    x0,
                    cond_all,
                    start_k[0].astype(compute_dtype),
                    start_b.astype(jnp.float32),
                    w_in0.astype(compute_dtype),
                    b_in0.astype(jnp.float32),
                    w_rs0[0].astype(compute_dtype),
                    b_rs0.astype(jnp.float32),
                    dilation=1,
                    n_valid=Tg,
                )
            else:
                xh, skip_total = wn_layer_stream2_first(
                    x0,
                    spect_p.astype(compute_dtype),
                    start_k[0].astype(compute_dtype),
                    start_b.astype(jnp.float32),
                    w_in0.astype(compute_dtype),
                    b_in0.astype(jnp.float32),
                    cond_k[0, :, : 2 * C].astype(compute_dtype),
                    cond_b[: 2 * C].astype(jnp.float32),
                    w_rs0[0].astype(compute_dtype),
                    b_rs0.astype(jnp.float32),
                    dilation=1,
                    n_valid=Tg,
                )
            first_done = 1
        else:
            xh = (
                jnp.einsum("btc,co->bto", x0, start_k[0].astype(compute_dtype))
                + start_b.astype(compute_dtype)
            ) * tile_mask
            skip_total = jnp.zeros_like(xh)
            first_done = 0

        for li in range(first_done, L - 1):
            w_in, b_in = _fold(wn[f"in{li}"])
            w_rs, b_rs = _fold(wn[f"res_skip{li}"])
            if composed_cond is not None:
                xh, skip_total = wn_layer_stream2_dcond(
                    xh,
                    cond_all,
                    li,
                    w_in.astype(compute_dtype),
                    b_in.astype(jnp.float32),
                    w_rs[0].astype(compute_dtype),
                    b_rs.astype(jnp.float32),
                    skip_total,
                    dilation=2 ** li,
                    n_valid=Tg,
                )
            else:
                xh, skip_total = wn_layer_stream2(
                    xh,
                    spect_p.astype(compute_dtype),
                    w_in.astype(compute_dtype),
                    b_in.astype(jnp.float32),
                    cond_k[0, :, 2 * C * li : 2 * C * (li + 1)].astype(compute_dtype),
                    cond_b[2 * C * li : 2 * C * (li + 1)].astype(jnp.float32),
                    w_rs[0].astype(compute_dtype),
                    b_rs.astype(jnp.float32),
                    skip_total,
                    dilation=2 ** li,
                    n_valid=Tg,
                    row_split=_ROW_SPLIT,
                )

        # last layer with the end projection (glow.py:166-175) folded in:
        # its hidden/skip tiles never round-trip through HBM
        li = L - 1
        w_in, b_in = _fold(wn[f"in{li}"])
        w_rs, b_rs = _fold(wn[f"res_skip{li}"])
        end_k = wn["end"]["kernel"][0]
        end_b = wn["end"]["bias"]
        if composed_cond is not None:
            wn_out = wn_layer_stream2_final_dcond(
                xh,
                cond_all,
                li,
                w_in.astype(compute_dtype),
                b_in.astype(jnp.float32),
                w_rs[0].astype(compute_dtype),
                b_rs.astype(jnp.float32),
                skip_total,
                end_k.astype(compute_dtype),
                end_b.astype(jnp.float32),
                dilation=2 ** li,
                n_valid=Tg,
            )
        else:
            wn_out = wn_layer_stream2_final(
                xh,
                spect_p.astype(compute_dtype),
                w_in.astype(compute_dtype),
                b_in.astype(jnp.float32),
                cond_k[0, :, 2 * C * li : 2 * C * (li + 1)].astype(compute_dtype),
                cond_b[2 * C * li : 2 * C * (li + 1)].astype(jnp.float32),
                w_rs[0].astype(compute_dtype),
                b_rs.astype(jnp.float32),
                skip_total,
                end_k.astype(compute_dtype),
                end_b.astype(jnp.float32),
                dilation=2 ** li,
                n_valid=Tg,
            )
        b_term = wn_out[..., :n_half]
        s_term = wn_out[..., n_half:]
        x1 = ((x1.astype(jnp.float32) - b_term) * jnp.exp(-s_term)).astype(
            compute_dtype
        )
        audio = jnp.concatenate([x0, x1], axis=-1) * tile_mask

        W = params[f"convinv{k_flow}"]["W"].astype(jnp.float32)
        W_inv = jnp.linalg.inv(W)
        audio = (
            audio.astype(jnp.float32) @ W_inv.T
        ).astype(compute_dtype)

        if k_flow % cfg.n_early_every == 0 and k_flow > 0:
            z = sigma * next_noise((B, Tp, cfg.n_early_size))
            audio = jnp.concatenate([z * tile_mask, audio], axis=-1)

    real = audio[:, :Tg]                                 # [B, Tg, n_group]
    return real.reshape(B, Tg * cfg.n_group).astype(jnp.float32)
