"""Tensor-parallel Tacotron decode (parallel/tp_tacotron.py) must match
the single-device serving decode: the column-sharded LSTM computes each
hidden unit with the identical contraction, so fp equality is tight; the
carry round-trips (sharded cell states feed the next chunk); int8 TP
tracks fp within the single-device int8 band.  Validates the
weight-streaming-split design on the 8-virtual-device CPU mesh (decode is
weight-bound — TP over p chips streams 36 MB / p per step; see the module
docstring's latency arithmetic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from text2speech_tpu.models.tacotron2 import DecoderState, Tacotron2
from text2speech_tpu.models.tacotron_serve import (
    decode_chunk_serve,
    extract_decoder_params,
)
from text2speech_tpu.parallel.tp_tacotron import (
    TPTacotronDecoder,
    shard_decoder_params,
)
from text2speech_tpu.text import N_SYMBOLS
from tests.test_synthesizer import HP
from tests.conftest import assert_trace_clean


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    model = Tacotron2(HP, n_vocab=N_SYMBOLS)
    B, T_in = 2, 12
    text = jnp.asarray(
        np.random.RandomState(0).randint(2, 70, (B, T_in)), jnp.int32
    )
    lengths = jnp.asarray([12, 9], jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng},
        text, lengths, jnp.zeros((B, HP.n_mel_channels, 8)),
        jnp.asarray([8, 8]),
    )
    memory = model.apply(
        variables, text, text_lengths=lengths, method=Tacotron2.encode
    )
    pmem = model.apply(
        variables, memory,
        method=lambda m, mem: m.decoder.attention.process_memory(mem),
    )
    z = lambda d: jnp.zeros((B, d), memory.dtype)
    state = DecoderState(
        z(HP.attention_rnn_dim), z(HP.attention_rnn_dim),
        z(HP.decoder_rnn_dim), z(HP.decoder_rnn_dim),
        jnp.zeros((B, T_in), memory.dtype), jnp.zeros((B, T_in), memory.dtype),
        z(HP.enc_conv_channels),
    )
    frame = jnp.zeros((B, HP.n_mel_channels), memory.dtype)
    finished = jnp.zeros((B,), bool)
    rngs = jax.random.split(jax.random.PRNGKey(7), 10)
    return variables, memory, pmem, state, frame, finished, lengths, rngs


def test_shard_decoder_params_partition(setup):
    variables = setup[0]
    dp = extract_decoder_params(variables, HP)
    dps = shard_decoder_params(dp, HP, 4)
    H = HP.attention_rnn_dim
    assert dps["att_ih_w"].shape == (4, dp["att_ih_w"].shape[0], 4 * H // 4)
    assert dps["att_ih_b"].shape == (4, 4 * H // 4)
    # reassembling the slices recovers the full kernel
    got = np.zeros(dp["att_ih_w"].shape, np.float32)
    from text2speech_tpu.parallel.tp_tacotron import _gate_cols
    for i in range(4):
        got[:, _gate_cols(H, 4, i)] = np.asarray(dps["att_ih_w"][i])
    np.testing.assert_array_equal(got, np.asarray(dp["att_ih_w"]))


@pytest.mark.parametrize("shape,axes", [
    ((8,), ("model",)),
    ((2, 4), ("data", "model")),
])
def test_tp_decode_matches_single_device(setup, shape, axes):
    (variables, memory, pmem, state, frame, finished, lengths,
     rngs) = setup
    devices = np.asarray(jax.devices("cpu")[:8]).reshape(shape)
    mesh = Mesh(devices, axes)

    dp = extract_decoder_params(variables, HP)
    if "data" in axes:
        # the always-on prenet dropout draws bernoulli over the LOCAL
        # batch shape, so a data shard's draws differ from the full-batch
        # single-device draws; rows decode independently, so the
        # data-sharded result equals per-shard single-device decode
        n_data = shape[0]
        B = memory.shape[0]
        sh = B // n_data
        parts = [
            decode_chunk_serve(
                dp, HP, memory[i : i + sh], pmem[i : i + sh],
                DecoderState(*(s[i : i + sh] for s in state)),
                frame[i : i + sh], finished[i : i + sh], rngs,
                text_lengths=lengths[i : i + sh],
            )
            for i in range(0, B, sh)
        ]
        cat = lambda xs: jnp.concatenate(xs, axis=0)
        st_r = DecoderState(*(cat([p[0][0][j] for p in parts])
                              for j in range(len(state))))
        fr_r = cat([p[0][1] for p in parts])
        fin_r = cat([p[0][2] for p in parts])
        mel_r, gate_r, align_r, act_r = (
            cat([p[k] for p in parts]) for k in range(1, 5)
        )
    else:
        (st_r, fr_r, fin_r), mel_r, gate_r, align_r, act_r = (
            decode_chunk_serve(
                dp, HP, memory, pmem, state, frame, finished, rngs,
                text_lengths=lengths,
            )
        )
    dec = TPTacotronDecoder(
        dp, HP, mesh,
        data_axis="data" if "data" in axes else None,
    )
    (st_t, fr_t, fin_t), mel_t, gate_t, align_t, act_t = dec(
        memory, pmem, state, frame, finished, rngs, lengths
    )
    np.testing.assert_allclose(np.asarray(mel_t), np.asarray(mel_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gate_t), np.asarray(gate_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(align_t), np.asarray(align_r),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(act_t), np.asarray(act_r))
    np.testing.assert_array_equal(np.asarray(fin_t), np.asarray(fin_r))
    # full carry — cell states arrive sharded P('model') but their global
    # VALUES equal the single-device carry
    for a, b in zip(st_t, st_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fr_t), np.asarray(fr_r),
                               atol=1e-5)


def test_tp_decode_carry_chains_and_no_retrace(setup):
    """A returned carry (with mesh-sharded cell states) feeds the next
    chunk's call and matches one long single-device decode; repeated
    same-shape calls hold ONE compiled program."""
    (variables, memory, pmem, state, frame, finished, lengths,
     rngs) = setup
    devices = np.asarray(jax.devices("cpu")[:8]).reshape(8)
    mesh = Mesh(devices, ("model",))
    dp = extract_decoder_params(variables, HP)

    rngs_all = jax.random.split(jax.random.PRNGKey(9), 8)
    _, mel_r, _, _, _ = decode_chunk_serve(
        dp, HP, memory, pmem, state, frame, finished, rngs_all,
        text_lengths=lengths,
    )

    dec = TPTacotronDecoder(dp, HP, mesh, data_axis=None)
    carry = (state, frame, finished)
    mels = []
    for half in (rngs_all[:4], rngs_all[4:]):
        carry, mel, _, _, _ = dec(memory, pmem, *carry, half, lengths)
        mels.append(np.asarray(mel))
    got = np.concatenate(mels, axis=-1)
    np.testing.assert_allclose(got, np.asarray(mel_r), atol=1e-5)
    assert_trace_clean("the TP decode pin")
    assert dec.cache_size() == 1, dec.cache_size()


def test_tp_decode_int8_tracks_fp(setup):
    (variables, memory, pmem, state, frame, finished, lengths,
     rngs) = setup
    devices = np.asarray(jax.devices("cpu")[:8]).reshape(8)
    mesh = Mesh(devices, ("model",))
    dp = extract_decoder_params(variables, HP)

    _, mel_fp, _, _, _ = decode_chunk_serve(
        dp, HP, memory, pmem, state, frame, finished, rngs,
        text_lengths=lengths,
    )
    dec_q = TPTacotronDecoder(dp, HP, mesh, data_axis=None, int8=True)
    _, mel_q, _, _, _ = dec_q(
        memory, pmem, state, frame, finished, rngs, lengths
    )
    assert np.isfinite(np.asarray(mel_q)).all()
    err = np.abs(np.asarray(mel_q) - np.asarray(mel_fp)).mean()
    scale = np.abs(np.asarray(mel_fp)).mean() + 1e-6
    assert err / scale < 0.2, (err, scale)
