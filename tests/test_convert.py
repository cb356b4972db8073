"""Torch->flax conversion parity: each layout convention (Linear/Conv1d/
LSTM gates/weight-norm/BiLSTM) is validated numerically against torch (CPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from text2speech_tpu.convert import _conv1d, _dense, _lstm_gates, _wnconv
from text2speech_tpu.models.tacotron2 import Conv1d
from text2speech_tpu.models.waveglow import WNConv
from text2speech_tpu.ops.lstm import BiLSTM, LSTMCell


def test_dense_conversion():
    lin = torch.nn.Linear(6, 4)
    x = torch.randn(3, 6)
    want = lin(x).detach().numpy()
    sd = {f"lin.{k}": v for k, v in lin.state_dict().items()}
    p = _dense(sd, "lin")
    got = np.asarray(jnp.asarray(x.numpy()) @ p["kernel"] + p["bias"])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv1d_conversion():
    conv = torch.nn.Conv1d(6, 8, kernel_size=5, padding=2)
    x = torch.randn(2, 6, 10)
    want = conv(x).detach().numpy()          # [B, out, T]
    sd = {f"c.{k}": v for k, v in conv.state_dict().items()}
    p = _conv1d(sd, "c")

    m = Conv1d(8, 5)
    variables = {"params": p}
    got = m.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=1e-5
    )


def test_lstm_cell_conversion():
    cell_t = torch.nn.LSTMCell(5, 7)
    x = torch.randn(3, 5)
    h0 = torch.zeros(3, 7)
    c0 = torch.zeros(3, 7)
    h1, c1 = cell_t(x, (h0, c0))
    sd = cell_t.state_dict()
    p = _lstm_gates(sd["weight_ih"], sd["weight_hh"], sd["bias_ih"], sd["bias_hh"])

    cell_j = LSTMCell(7)
    state = LSTMCell.init_state(3, 7)
    (h, c), _ = cell_j.apply({"params": p}, state, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(h), h1.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c1.detach().numpy(), atol=1e-5)


def test_bilstm_conversion():
    lstm = torch.nn.LSTM(4, 3, batch_first=True, bidirectional=True)
    x = torch.randn(2, 9, 4)
    want, _ = lstm(x)
    sd = lstm.state_dict()
    p = {
        "fwd": {"LSTMCell_0": _lstm_gates(
            sd["weight_ih_l0"], sd["weight_hh_l0"],
            sd["bias_ih_l0"], sd["bias_hh_l0"])},
        "bwd": {"LSTMCell_0": _lstm_gates(
            sd["weight_ih_l0_reverse"], sd["weight_hh_l0_reverse"],
            sd["bias_ih_l0_reverse"], sd["bias_hh_l0_reverse"])},
    }
    m = BiLSTM(3)
    got = m.apply({"params": p}, jnp.asarray(x.numpy()), None)
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=1e-5
    )


def test_weightnorm_conv_conversion():
    conv = torch.nn.utils.weight_norm(
        torch.nn.Conv1d(4, 6, kernel_size=3, dilation=2, padding=2)
    )
    x = torch.randn(1, 4, 12)
    want = conv(x).detach().numpy()
    sd = {f"w.{k}": v for k, v in conv.state_dict().items()}
    p = _wnconv(sd, "w")

    m = WNConv(6, 3, dilation=2)
    got = m.apply({"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=1e-5
    )


def test_weightnorm_removed_folds_exactly():
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 6, kernel_size=1))
    conv = torch.nn.utils.remove_weight_norm(conv)
    sd = {f"w.{k}": v for k, v in conv.state_dict().items()}
    p = _wnconv(sd, "w")
    # kernel reconstruction: v/||v|| * g == original weight
    v, g = p["v"], p["g"]
    norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
    kernel = v / norm * g[None, None, :]
    np.testing.assert_allclose(
        kernel, sd["w.weight"].numpy().transpose(2, 1, 0), atol=1e-6
    )


def test_fuse_res_skip_old_layout():
    """Pre-fusion WaveGlow checkpoints (separate res/skip convs) fuse by
    channel concat (convert_model.py:11-38 capability)."""
    import numpy as np

    from text2speech_tpu.convert import _fuse_res_skip

    rng = np.random.RandomState(0)
    sd = {
        "WN.0.res_layers.0.weight_v": rng.randn(8, 8, 1).astype(np.float32),
        "WN.0.res_layers.0.weight_g": rng.randn(8, 1, 1).astype(np.float32),
        "WN.0.res_layers.0.bias": rng.randn(8).astype(np.float32),
        "WN.0.skip_layers.0.weight_v": rng.randn(8, 8, 1).astype(np.float32),
        "WN.0.skip_layers.0.weight_g": rng.randn(8, 1, 1).astype(np.float32),
        "WN.0.skip_layers.0.bias": rng.randn(8).astype(np.float32),
        "WN.0.start.weight": rng.randn(8, 4, 1).astype(np.float32),
    }
    out = _fuse_res_skip(sd)
    assert "WN.0.res_skip_layers.0.weight_v" in out
    assert out["WN.0.res_skip_layers.0.weight_v"].shape == (16, 8, 1)
    assert out["WN.0.res_skip_layers.0.bias"].shape == (16,)
    np.testing.assert_array_equal(
        out["WN.0.res_skip_layers.0.bias"][:8], sd["WN.0.res_layers.0.bias"]
    )
    assert not any("res_layers" in k for k in out)
    assert "WN.0.start.weight" in out


def _tiny_hp():
    from text2speech_tpu.config import HParams

    return HParams(
        embedding_size=16, enc_conv_num_layers=2, enc_conv_channels=16,
        enc_conv_kernel_size=5, attention_rnn_dim=16, decoder_rnn_dim=16,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, prenet_dim=8, n_mel_channels=8,
        postnet_embedding_dim=8, postnet_n_convolutions=2, max_decoder_steps=8,
    )


def test_tacotron_full_state_dict_conversion():
    """A complete reference-shaped Tacotron state_dict converts into params
    our model accepts and runs with (catches any key/transpose mismatch)."""
    import numpy as np

    from text2speech_tpu.convert import tacotron_from_torch
    from text2speech_tpu.models.tacotron2 import Tacotron2

    hp = _tiny_hp()
    rng = np.random.RandomState(0)
    E, A, D, AD, M, P = (hp.enc_conv_channels, hp.attention_rnn_dim,
                         hp.decoder_rnn_dim, hp.attention_dim,
                         hp.n_mel_channels, hp.prenet_dim)
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.05)
    sd = {"embedding.weight": t(80, hp.embedding_size)}
    for i in range(hp.enc_conv_num_layers):
        cin = hp.embedding_size if i == 0 else E
        sd[f"encoder.convolutions.{i}.0.conv.weight"] = t(E, cin, 5)
        sd[f"encoder.convolutions.{i}.0.conv.bias"] = t(E)
        sd[f"encoder.convolutions.{i}.1.weight"] = t(E)
        sd[f"encoder.convolutions.{i}.1.bias"] = t(E)
        sd[f"encoder.convolutions.{i}.1.running_mean"] = t(E)
        sd[f"encoder.convolutions.{i}.1.running_var"] = torch.ones(E)
    H = E // 2
    for sfx in ("", "_reverse"):
        sd[f"encoder.lstm.weight_ih_l0{sfx}"] = t(4 * H, E)
        sd[f"encoder.lstm.weight_hh_l0{sfx}"] = t(4 * H, H)
        sd[f"encoder.lstm.bias_ih_l0{sfx}"] = t(4 * H)
        sd[f"encoder.lstm.bias_hh_l0{sfx}"] = t(4 * H)
    sd["decoder.prenet.layers.0.linear_layer.weight"] = t(P, M)
    sd["decoder.prenet.layers.1.linear_layer.weight"] = t(P, P)
    sd["decoder.attention_rnn.weight_ih"] = t(4 * A, P + E)
    sd["decoder.attention_rnn.weight_hh"] = t(4 * A, A)
    sd["decoder.attention_rnn.bias_ih"] = t(4 * A)
    sd["decoder.attention_rnn.bias_hh"] = t(4 * A)
    sd["decoder.attention_layer.query_layer.linear_layer.weight"] = t(AD, A)
    sd["decoder.attention_layer.memory_layer.linear_layer.weight"] = t(AD, E)
    sd["decoder.attention_layer.v.linear_layer.weight"] = t(1, AD)
    sd["decoder.attention_layer.location_layer.location_conv.conv.weight"] = t(
        hp.attention_location_n_filters, 2, hp.attention_location_kernel_size)
    sd["decoder.attention_layer.location_layer.location_dense.linear_layer.weight"] = t(
        AD, hp.attention_location_n_filters)
    sd["decoder.decoder_rnn.weight_ih"] = t(4 * D, A + E)
    sd["decoder.decoder_rnn.weight_hh"] = t(4 * D, D)
    sd["decoder.decoder_rnn.bias_ih"] = t(4 * D)
    sd["decoder.decoder_rnn.bias_hh"] = t(4 * D)
    sd["decoder.linear_projection.linear_layer.weight"] = t(M, D + E)
    sd["decoder.linear_projection.linear_layer.bias"] = t(M)
    sd["decoder.gate_layer.linear_layer.weight"] = t(1, D + E)
    sd["decoder.gate_layer.linear_layer.bias"] = t(1)
    for i in range(hp.postnet_n_convolutions):
        cin = M if i == 0 else hp.postnet_embedding_dim
        cout = M if i == hp.postnet_n_convolutions - 1 else hp.postnet_embedding_dim
        sd[f"postnet.convolutions.{i}.0.conv.weight"] = t(cout, cin, 5)
        sd[f"postnet.convolutions.{i}.0.conv.bias"] = t(cout)
        sd[f"postnet.convolutions.{i}.1.weight"] = t(cout)
        sd[f"postnet.convolutions.{i}.1.bias"] = t(cout)
        sd[f"postnet.convolutions.{i}.1.running_mean"] = t(cout)
        sd[f"postnet.convolutions.{i}.1.running_var"] = torch.ones(cout)

    params, stats = tacotron_from_torch(sd, hp)

    model = Tacotron2(hp, n_vocab=80)
    rng2 = jax.random.PRNGKey(0)
    init_vars = model.init(
        {"params": rng2, "dropout": rng2},
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6]),
        jnp.zeros((1, M, 8)), jnp.asarray([8]),
    )
    # converted tree must match the init tree structure exactly
    want = jax.tree_util.tree_structure(init_vars["params"])
    got = jax.tree_util.tree_structure(params)
    assert want == got, (want, got)
    shapes_match = jax.tree.map(
        lambda a, c: a.shape == c.shape, init_vars["params"], params
    )
    assert all(jax.tree.leaves(shapes_match))

    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.zeros((1, 6), jnp.int32),
        text_lengths=jnp.asarray([6]),
        method=Tacotron2.inference,
        rngs={"dropout": rng2},
    )
    assert np.isfinite(np.asarray(out[1])).all()


def test_waveglow_full_state_dict_conversion():
    import numpy as np

    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.convert import waveglow_from_torch
    from text2speech_tpu.models.waveglow import WaveGlow

    cfg = WaveGlowConfig(
        n_mel_channels=8, n_flows=2, n_group=4, n_early_every=4,
        wn_n_layers=2, wn_n_channels=16, wn_kernel_size=3,
        upsample_kernel=32, upsample_stride=8, segment_length=256,
    )
    rng = np.random.RandomState(0)
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.05)
    C, L, M = cfg.wn_n_channels, cfg.wn_n_layers, cfg.n_mel_channels
    sd = {
        "upsample.weight": t(M, M, cfg.upsample_kernel),
        "upsample.bias": t(M),
    }
    n_half = cfg.n_group // 2
    for k in range(cfg.n_flows):
        sd[f"convinv.{k}.conv.weight"] = t(cfg.n_group, cfg.n_group, 1)
        sd[f"WN.{k}.start.weight_v"] = t(C, n_half, 1)
        sd[f"WN.{k}.start.weight_g"] = t(C, 1, 1)
        sd[f"WN.{k}.start.bias"] = t(C)
        for i in range(L):
            sd[f"WN.{k}.in_layers.{i}.weight_v"] = t(2 * C, C, 3)
            sd[f"WN.{k}.in_layers.{i}.weight_g"] = t(2 * C, 1, 1)
            sd[f"WN.{k}.in_layers.{i}.bias"] = t(2 * C)
            sd[f"WN.{k}.cond_layers.{i}.weight_v"] = t(2 * C, M * cfg.n_group, 1)
            sd[f"WN.{k}.cond_layers.{i}.weight_g"] = t(2 * C, 1, 1)
            sd[f"WN.{k}.cond_layers.{i}.bias"] = t(2 * C)
            rs = 2 * C if i < L - 1 else C
            sd[f"WN.{k}.res_skip_layers.{i}.weight_v"] = t(rs, C, 1)
            sd[f"WN.{k}.res_skip_layers.{i}.weight_g"] = t(rs, 1, 1)
            sd[f"WN.{k}.res_skip_layers.{i}.bias"] = t(rs)
        sd[f"WN.{k}.end.weight"] = t(2 * n_half, C, 1)
        sd[f"WN.{k}.end.bias"] = t(2 * n_half)

    params = waveglow_from_torch(sd, cfg)
    model = WaveGlow(cfg)
    frames = 16
    init_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, M, frames)),
        jnp.zeros((1, frames * cfg.upsample_stride)),
    )
    assert jax.tree_util.tree_structure(init_vars["params"]) == (
        jax.tree_util.tree_structure(params)
    )
    shapes_match = jax.tree.map(
        lambda a, c: a.shape == c.shape, init_vars["params"], params
    )
    assert all(jax.tree.leaves(shapes_match))
    z, log_s, log_det = model.apply(
        {"params": params},
        jnp.zeros((1, M, frames)),
        jnp.asarray(rng.randn(1, frames * cfg.upsample_stride), jnp.float32),
    )
    assert np.isfinite(np.asarray(z)).all()
