"""Reference (PyTorch) checkpoint -> flax params conversion.

Replaces the reference's checkpoint-migration machinery
(``/root/reference/waveglow/convert_model.py``, ``glow_old.py``) and extends
it across frameworks: a torch ``state_dict`` from the reference Tacotron
(``train.py:69-75`` format) or WaveGlow (``waveglow/train.py:52-60``) maps
weight-for-weight onto our parameter trees.

Layout conventions handled:
  torch Linear  [out, in]        -> flax Dense kernel [in, out]
  torch Conv1d  [out, in, k]     -> flax Conv kernel  [k, in, out]
  torch ConvT1d [in, out, k]     -> SubpixelUpsample  [k, in, out]
  torch LSTM(+Cell) gates (i,f,g,o) == ours; weight_ih [4H, in] -> ih/kernel.T
  torch weight_norm (weight_g [out,1,1], weight_v [out,in,k]) -> (g [out],
        v [k, in, out]); plain ``weight`` (post remove_weightnorm) folds to
        v=weight, g=||v|| so kernel reproduces exactly.
  pre-fusion WaveGlow checkpoints (separate res/skip convs) are fused by
  channel-concat like ``convert_model.update_model`` (``convert_model.py:11-38``).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _dense(sd, name):
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _conv1d(sd, name):
    out = {"Conv_0": {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 1, 0)}}
    if f"{name}.bias" in sd:
        out["Conv_0"]["bias"] = _np(sd[f"{name}.bias"])
    return out


def _lstm_gates(w_ih, w_hh, b_ih, b_hh):
    return {
        "ih": {"kernel": _np(w_ih).T, "bias": _np(b_ih)},
        "hh": {"kernel": _np(w_hh).T, "bias": _np(b_hh)},
    }


def _bn(sd, name):
    scale_bias = {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}
    stats = {
        "mean": _np(sd[f"{name}.running_mean"]),
        "var": _np(sd[f"{name}.running_var"]),
    }
    return scale_bias, stats


def _wnconv(sd, name):
    """Weight-normalized conv -> (v [k,in,out], g [out])."""
    if f"{name}.weight_v" in sd:
        v = _np(sd[f"{name}.weight_v"]).transpose(2, 1, 0)
        g = _np(sd[f"{name}.weight_g"]).reshape(-1)
    else:  # weight-norm removed: fold so kernel == weight exactly
        v = _np(sd[f"{name}.weight"]).transpose(2, 1, 0)
        g = np.sqrt((v * v).sum(axis=(0, 1)) + 1e-12)
    out = {"v": v, "g": g}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def tacotron_from_torch(state_dict: Mapping[str, Any], hp) -> tuple[dict, dict]:
    """Reference Tacotron ``state_dict`` -> (params, batch_stats)."""
    sd = state_dict
    params: dict = {}
    stats: dict = {}

    params["embedding"] = {"embedding": _np(sd["embedding.weight"])}

    enc: dict = {}
    enc_stats: dict = {}
    for i in range(hp.enc_conv_num_layers):
        enc[f"conv{i}"] = _conv1d(sd, f"encoder.convolutions.{i}.0.conv")
        bn, st = _bn(sd, f"encoder.convolutions.{i}.1")
        enc[f"bn{i}"] = bn
        enc_stats[f"bn{i}"] = st
    enc["bilstm"] = {
        "fwd": {"LSTMCell_0": _lstm_gates(
            sd["encoder.lstm.weight_ih_l0"], sd["encoder.lstm.weight_hh_l0"],
            sd["encoder.lstm.bias_ih_l0"], sd["encoder.lstm.bias_hh_l0"])},
        "bwd": {"LSTMCell_0": _lstm_gates(
            sd["encoder.lstm.weight_ih_l0_reverse"],
            sd["encoder.lstm.weight_hh_l0_reverse"],
            sd["encoder.lstm.bias_ih_l0_reverse"],
            sd["encoder.lstm.bias_hh_l0_reverse"])},
    }
    params["encoder"] = enc
    stats["encoder"] = enc_stats

    dec: dict = {}
    dec["prenet"] = {
        "fc0": _dense(sd, "decoder.prenet.layers.0.linear_layer"),
        "fc1": _dense(sd, "decoder.prenet.layers.1.linear_layer"),
    }
    dec["attention_rnn"] = _lstm_gates(
        sd["decoder.attention_rnn.weight_ih"], sd["decoder.attention_rnn.weight_hh"],
        sd["decoder.attention_rnn.bias_ih"], sd["decoder.attention_rnn.bias_hh"])
    dec["decoder_rnn"] = _lstm_gates(
        sd["decoder.decoder_rnn.weight_ih"], sd["decoder.decoder_rnn.weight_hh"],
        sd["decoder.decoder_rnn.bias_ih"], sd["decoder.decoder_rnn.bias_hh"])
    dec["attention"] = {
        "query": _dense(sd, "decoder.attention_layer.query_layer.linear_layer"),
        "memory": _dense(sd, "decoder.attention_layer.memory_layer.linear_layer"),
        "v": _dense(sd, "decoder.attention_layer.v.linear_layer"),
        "loc_conv": _conv1d(
            sd, "decoder.attention_layer.location_layer.location_conv.conv"),
        "loc_dense": _dense(
            sd, "decoder.attention_layer.location_layer.location_dense.linear_layer"),
    }
    dec["mel_proj"] = _dense(sd, "decoder.linear_projection.linear_layer")
    dec["gate_proj"] = _dense(sd, "decoder.gate_layer.linear_layer")
    params["decoder"] = dec

    post: dict = {}
    post_stats: dict = {}
    for i in range(hp.postnet_n_convolutions):
        post[f"conv{i}"] = _conv1d(sd, f"postnet.convolutions.{i}.0.conv")
        bn, st = _bn(sd, f"postnet.convolutions.{i}.1")
        post[f"bn{i}"] = bn
        post_stats[f"bn{i}"] = st
    params["postnet"] = post
    stats["postnet"] = post_stats
    return params, stats


def _fuse_res_skip(sd: dict) -> dict:
    """Fuse pre-fusion res/skip convs (``convert_model.py:11-38``) into
    ``res_skip_layers`` keys; no-op for already-fused checkpoints."""
    if not any("res_layers" in k for k in sd):
        return dict(sd)
    out = {k: v for k, v in sd.items()
           if "res_layers" not in k and "skip_layers" not in k}
    import re

    idx = sorted(
        {(m.group(1), int(m.group(2)))
         for k in sd
         for m in [re.match(r"WN\.(\d+)\.res_layers\.(\d+)\.", k)] if m}
    )
    for flow, layer in idx:
        for suffix in ("weight_g", "weight_v", "bias", "weight"):
            rk = f"WN.{flow}.res_layers.{layer}.{suffix}"
            skk = f"WN.{flow}.skip_layers.{layer}.{suffix}"
            if rk in sd and skk in sd:
                out[f"WN.{flow}.res_skip_layers.{layer}.{suffix}"] = np.concatenate(
                    [_np(sd[rk]), _np(sd[skk])], axis=0
                )
    return out


def waveglow_from_torch(state_dict: Mapping[str, Any], cfg) -> dict:
    """Reference WaveGlow ``state_dict`` -> params tree."""
    sd = _fuse_res_skip(dict(state_dict))
    params: dict = {}
    params["upsample"] = {
        "kernel": _np(sd["upsample.weight"]).transpose(2, 0, 1),
        "bias": _np(sd["upsample.bias"]),
    }
    L = cfg.wn_n_layers
    C = cfg.wn_n_channels
    for k in range(cfg.n_flows):
        params[f"convinv{k}"] = {"W": _np(sd[f"convinv.{k}.conv.weight"])[:, :, 0]}
        wn: dict = {"start": _wnconv(sd, f"WN.{k}.start")}
        # reference cond_layers are per-layer; ours is one fused conv over
        # the layer axis: concat output channels in layer order.
        cond_vs, cond_gs, cond_bs = [], [], []
        for i in range(L):
            c = _wnconv(sd, f"WN.{k}.cond_layers.{i}")
            cond_vs.append(c["v"])
            cond_gs.append(c["g"])
            cond_bs.append(c.get("bias", np.zeros(c["g"].shape, np.float32)))
        wn["cond"] = {
            "v": np.concatenate(cond_vs, axis=-1),
            "g": np.concatenate(cond_gs, axis=-1),
            "bias": np.concatenate(cond_bs, axis=-1),
        }
        for i in range(L):
            wn[f"in{i}"] = _wnconv(sd, f"WN.{k}.in_layers.{i}")
            wn[f"res_skip{i}"] = _wnconv(sd, f"WN.{k}.res_skip_layers.{i}")
        wn["end"] = {
            "kernel": _np(sd[f"WN.{k}.end.weight"]).transpose(2, 1, 0),
            "bias": _np(sd[f"WN.{k}.end.bias"]),
        }
        params[f"wn{k}"] = wn
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference checkpoint file and return its flat state_dict.

    Handles the Tacotron format (dict with 'state_dict', ``train.py:72``) and
    the WaveGlow whole-model pickle (dict with 'model', ``waveglow/train.py:55``,
    needing its class importable) or a bare state_dict.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        if "state_dict" in ckpt:
            return ckpt["state_dict"]
        if "model" in ckpt and hasattr(ckpt["model"], "state_dict"):
            return ckpt["model"].state_dict()
        if all(hasattr(v, "shape") for v in ckpt.values()):
            return ckpt
    if hasattr(ckpt, "state_dict"):
        return ckpt.state_dict()
    raise ValueError(f"unrecognized checkpoint format: {path}")
