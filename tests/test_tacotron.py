"""Tacotron-2 model tests (SURVEY.md §4 item 3): shapes, masking semantics,
stop-token behavior, differentiability, and the LSTM/attention step math vs a
hand-computed numpy reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text2speech_tpu.config import HParams
from text2speech_tpu.models.losses import bce_with_logits, tacotron2_loss
from text2speech_tpu.models.tacotron2 import Tacotron2, sequence_mask
from text2speech_tpu.ops.lstm import BiLSTM, LSTMCell, reverse_padded

TINY = HParams(
    embedding_size=32,
    enc_conv_num_layers=2,
    enc_conv_channels=32,
    enc_conv_kernel_size=5,
    attention_rnn_dim=40,
    decoder_rnn_dim=48,
    attention_dim=24,
    attention_location_n_filters=8,
    attention_location_kernel_size=15,
    prenet_dim=16,
    n_mel_channels=20,
    postnet_embedding_dim=24,
    postnet_n_convolutions=3,
    max_decoder_steps=50,
)

B, T_IN, T_OUT = 2, 11, 17


@pytest.fixture(scope="module")
def model_and_vars():
    model = Tacotron2(TINY, n_vocab=80)
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((B, T_IN), jnp.int32) + 3
    lengths = jnp.asarray([T_IN, T_IN - 4], jnp.int32)
    mels = jnp.zeros((B, TINY.n_mel_channels, T_OUT))
    out_lengths = jnp.asarray([T_OUT, T_OUT - 5], jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng},
        text, lengths, mels, out_lengths,
    )
    return model, variables


def test_lstm_cell_matches_numpy():
    cell = LSTMCell(4)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3).astype(np.float32))
    state = LSTMCell.init_state(1, 4)
    variables = cell.init(jax.random.PRNGKey(1), state, x)
    (h, c), y = cell.apply(variables, state, x)

    p = jax.tree.map(np.asarray, variables["params"])
    gates = x @ p["ih"]["kernel"] + p["ih"]["bias"] + p["hh"]["bias"]
    i, f, g, o = np.split(np.asarray(gates), 4, axis=-1)
    sig = lambda v: 1 / (1 + np.exp(-v))
    c_want = sig(f) * 0 + sig(i) * np.tanh(g)
    h_want = sig(o) * np.tanh(c_want)
    np.testing.assert_allclose(np.asarray(h), h_want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_want, atol=1e-5)


def test_reverse_padded():
    xs = jnp.arange(10.0).reshape(1, 10, 1)
    out = np.asarray(reverse_padded(xs, jnp.asarray([4])))
    np.testing.assert_array_equal(out[0, :4, 0], [3, 2, 1, 0])
    np.testing.assert_array_equal(out[0, 4:, 0], np.arange(4, 10))


def test_bilstm_masks_padding():
    xs = jnp.asarray(np.random.RandomState(0).randn(2, 8, 3).astype(np.float32))
    lengths = jnp.asarray([8, 5])
    m = BiLSTM(4)
    variables = m.init(jax.random.PRNGKey(0), xs, lengths)
    out = np.asarray(m.apply(variables, xs, lengths))
    assert out.shape == (2, 8, 8)
    assert np.abs(out[1, 5:]).max() == 0.0
    # backward outputs for the shorter sequence must differ from the full one
    out_full = np.asarray(m.apply(variables, xs, jnp.asarray([8, 8])))
    assert not np.allclose(out[1, :5], out_full[1, :5])


def test_forward_shapes_and_masking(model_and_vars):
    model, variables = model_and_vars
    text = jnp.zeros((B, T_IN), jnp.int32) + 3
    lengths = jnp.asarray([T_IN, T_IN - 4], jnp.int32)
    mels = jnp.asarray(np.random.RandomState(0).randn(B, TINY.n_mel_channels, T_OUT).astype(np.float32))
    out_lengths = jnp.asarray([T_OUT, T_OUT - 5], jnp.int32)

    (mel_out, mel_post, gate_out, align), _ = model.apply(
        variables, text, lengths, mels, out_lengths,
        train=True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert mel_out.shape == (B, TINY.n_mel_channels, T_OUT)
    assert mel_post.shape == mel_out.shape
    assert gate_out.shape == (B, T_OUT)
    assert align.shape == (B, T_OUT, T_IN)
    # parse_output masking: frames beyond output_lengths zeroed, gate pinned 1e3
    assert np.abs(np.asarray(mel_out)[1, :, T_OUT - 5 :]).max() == 0.0
    assert (np.asarray(gate_out)[1, T_OUT - 5 :] == 1e3).all()
    # attention rows are distributions over valid memory
    a = np.asarray(align)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-4)
    assert a[1, :, T_IN - 4 :].max() < 1e-6  # masked encoder positions


def test_inference_stop_token(model_and_vars):
    model, variables = model_and_vars
    text = jnp.zeros((1, T_IN), jnp.int32) + 5
    mel_out, mel_post, gate_out, align, out_lengths = model.apply(
        variables, text,
        method=Tacotron2.inference,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    T = TINY.max_decoder_steps
    assert mel_out.shape == (1, TINY.n_mel_channels, T)
    n = int(out_lengths[0])
    assert 1 <= n <= T
    if n < T:
        assert np.abs(np.asarray(mel_out)[0, :, n:]).max() == 0.0
        assert (np.asarray(gate_out)[0, n:] == 1e3).all()


def test_train_step_grads(model_and_vars):
    model, variables = model_and_vars
    text = jnp.zeros((B, T_IN), jnp.int32) + 3
    lengths = jnp.asarray([T_IN, T_IN - 4], jnp.int32)
    mels = jnp.asarray(np.random.RandomState(1).randn(B, TINY.n_mel_channels, T_OUT).astype(np.float32))
    out_lengths = jnp.asarray([T_OUT, T_OUT - 5], jnp.int32)
    gate_target = 1.0 - sequence_mask(out_lengths - 1, T_OUT).astype(jnp.float32)

    def loss_fn(params):
        (mel_out, mel_post, gate_out, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            text, lengths, mels, out_lengths,
            train=True, rngs={"dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        loss, _ = tacotron2_loss(mel_out, mel_post, gate_out, mels, gate_target)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert all(np.isfinite(v) for v in flat)
    assert sum(flat) > 0


def test_bce_with_logits_matches_definition():
    logits = jnp.asarray([-5.0, -1.0, 0.0, 1.0, 5.0, 1e3])
    targets = jnp.asarray([0.0, 1.0, 0.5, 0.0, 1.0, 1.0])
    got = np.asarray(bce_with_logits(logits, targets))
    x, t = np.asarray(logits[:-1], np.float64), np.asarray(targets[:-1], np.float64)
    want = -(t * np.log(1 / (1 + np.exp(-x))) + (1 - t) * np.log(1 - 1 / (1 + np.exp(-x))))
    np.testing.assert_allclose(got[:-1], want, atol=1e-5)
    assert np.isfinite(got[-1]) and got[-1] < 1e-6  # gate=1e3, target=1 -> ~0


def test_multi_speaker_conditioning():
    """Different speaker ids must change the output when num_speakers > 1."""
    model = Tacotron2(TINY, n_vocab=80, num_speakers=3)
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((2, T_IN), jnp.int32) + 3
    lengths = jnp.asarray([T_IN, T_IN], jnp.int32)
    mels = jnp.zeros((2, TINY.n_mel_channels, T_OUT))
    out_lengths = jnp.asarray([T_OUT, T_OUT], jnp.int32)
    sp = jnp.asarray([0, 2], jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng},
        text, lengths, mels, out_lengths, speaker_ids=sp,
    )
    assert "speaker_proj" in variables["params"]

    def run(speakers):
        (mel_out, *_), _ = model.apply(
            variables, text, lengths, mels, out_lengths,
            speaker_ids=speakers, train=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return np.asarray(mel_out)

    out_a = run(jnp.asarray([0, 0], jnp.int32))
    out_b = run(jnp.asarray([1, 1], jnp.int32))
    assert not np.allclose(out_a, out_b)


def test_bf16_inference_close_to_f32():
    """compute_dtype=bf16 inference stays finite and close to f32 (the
    serving-precision policy; fp32 remains the training default)."""
    f32_model = Tacotron2(TINY, n_vocab=80)
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((1, T_IN), jnp.int32) + 7
    lengths = jnp.asarray([T_IN], jnp.int32)
    mels = jnp.zeros((1, TINY.n_mel_channels, T_OUT))
    out_lengths = jnp.asarray([T_OUT], jnp.int32)
    variables = f32_model.init(
        {"params": rng, "dropout": rng}, text, lengths, mels, out_lengths
    )
    bf16_model = Tacotron2(TINY, n_vocab=80, compute_dtype=jnp.bfloat16)

    def infer(model):
        return model.apply(
            variables, text, text_lengths=lengths,
            method=Tacotron2.inference, rngs={"dropout": jax.random.PRNGKey(5)},
        )

    mel_f32 = np.asarray(infer(f32_model)[1])
    out_bf16 = infer(bf16_model)
    mel_bf16 = np.asarray(out_bf16[1])
    assert mel_bf16.dtype == np.float32  # outputs cast back
    assert np.isfinite(mel_bf16).all()
    # early frames (before stop-token divergence) should be close-ish
    assert np.abs(mel_bf16[:, :, :3] - mel_f32[:, :, :3]).max() < 0.15
