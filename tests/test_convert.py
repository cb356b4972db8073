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
