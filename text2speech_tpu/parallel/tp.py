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


def shard_waveglow_params(params: dict, cfg: WaveGlowConfig, n_model: int):
    """Fold weight-norm and pre-split every WN tensor across ``n_model``
    devices.  Returns a pytree whose WN leaves have a leading [n_model] axis
    (to be placed with ``P('model')``); small replicated pieces (upsample,
    convinv, start) keep their shapes."""
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
        w_rs, b_rs = blk[f"rs{li}"]["w"][0], blk[f"rs{li}"]["b"][0]
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
):
    """Tensor(+data)-parallel WaveGlow inference.

    mel [B, n_mel, frames] -> audio [B, samples]; numerically equivalent to
    ``model.apply(..., method=WaveGlow.infer, noise=noise)`` (fp32).  The
    standard-normal draws are made host-side (:func:`..models.chunked.draw_noise`
    order) and sharded over 'data' with the batch, so every device sees
    exactly the slice the single-device path would.  ``mesh`` must carry
    ``model_axis``; if ``data_axis`` is present the mel batch is additionally
    sharded over it.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..models.chunked import draw_noise

    cfg = model.cfg
    n_model = mesh.shape[model_axis]
    tp_params = shard_waveglow_params(variables["params"], cfg, n_model)

    B = spect.shape[0]
    T_g = spect.shape[2] * cfg.upsample_stride // cfg.n_group
    if noise is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        noise = draw_noise(cfg, key, B, T_g, jnp.float32)
    noise = tuple(jnp.asarray(z) for z in noise)

    # WN leaves with a leading device axis are sharded over 'model';
    # replicated pieces (start, the post-psum biases, upsample, convinv)
    # get P().
    mp = P(model_axis)
    blk_specs = {"start_k": P(), "start_b": P()}
    for li in range(cfg.wn_n_layers):
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

    batch_spec = P(data_axis) if data_axis in mesh.axis_names else P()
    noise_specs = tuple(batch_spec for _ in noise)

    def run(tp_params, spect, noise):
        cond = _upsample_group(tp_params["upsample"], cfg, spect)
        Bl, Tg_l, _ = cond.shape
        noise_iter = iter(noise)
        x = sigma * next(noise_iter)
        for k in reversed(range(cfg.n_flows)):
            n_half = x.shape[-1] // 2
            x0, x1 = x[..., :n_half], x[..., n_half:]
            wn_out = _wn_tp(tp_params[f"wn{k}"], x0, cond, cfg, model_axis)
            b = wn_out[..., :n_half]
            s = wn_out[..., n_half:]
            x1 = (x1 - b) * jnp.exp(-s)
            x = jnp.concatenate([x0, x1], axis=-1)
            W = tp_params[f"convinv{k}"]["W"].astype(jnp.float32)
            x = (x.astype(jnp.float32) @ jnp.linalg.inv(W).T).astype(x.dtype)
            if k % cfg.n_early_every == 0 and k > 0:
                x = jnp.concatenate([sigma * next(noise_iter), x], axis=-1)
        return x.reshape(Bl, Tg_l * cfg.n_group)

    import inspect

    kw = {}
    sig = inspect.signature(shard_map)
    if "check_rep" in sig.parameters:       # older API name
        kw["check_rep"] = False
    elif "check_vma" in sig.parameters:
        kw["check_vma"] = False
    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(param_specs, batch_spec, noise_specs),
        out_specs=batch_spec,
        **kw,
    )
    # place the sharded params/batch so no resharding happens at dispatch
    tp_params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tp_params, param_specs,
    )
    spect = jax.device_put(spect, NamedSharding(mesh, batch_spec))
    return jax.jit(fn)(tp_params, spect, noise)


def _upsample_group(up_params, cfg: WaveGlowConfig, spect: jnp.ndarray):
    """Replicated subpixel upsample + grouping (= WaveGlow's
    ``_upsample_group_spect`` with n_samples=None)."""
    k, s = cfg.upsample_kernel, cfg.upsample_stride
    r = k // s
    kernel = up_params["kernel"]
    bias = up_params["bias"]
    x = spect.transpose(0, 2, 1)
    B, F, M = x.shape
    kq = kernel.reshape(r, s, kernel.shape[1], kernel.shape[2])
    y = jnp.einsum("bti,qpio->btqpo", x, kq)
    out = jnp.zeros((B, F + r - 1, s, y.shape[-1]), y.dtype)
    for q in range(r):
        out = out.at[:, q : q + F].add(y[:, :, q])
    up = out.reshape(B, (F + r - 1) * s, -1) + bias
    up = up[:, : up.shape[1] - (k - s)]
    G = cfg.n_group
    T_g = up.shape[1] // G
    up = up[:, : T_g * G].reshape(B, T_g, G, -1)
    return up.transpose(0, 1, 3, 2).reshape(B, T_g, -1)
