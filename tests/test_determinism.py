"""Determinism: identical seeds -> identical training trajectories and data
order (the reference scattered manual seeds; here it's by construction —
SURVEY.md §5 'race detection / determinism')."""

import numpy as np

import jax
import jax.numpy as jnp

from text2speech_tpu.config import HParams
from text2speech_tpu.data.dataset import Batch
from text2speech_tpu.models.tacotron2 import Tacotron2
from text2speech_tpu.text import N_SYMBOLS
from text2speech_tpu.train.state import create_train_state
from text2speech_tpu.train.tacotron import make_train_step

TINY = HParams(
    embedding_size=16, enc_conv_num_layers=1, enc_conv_channels=16,
    attention_rnn_dim=16, decoder_rnn_dim=16, attention_dim=8,
    attention_location_n_filters=4, attention_location_kernel_size=7,
    prenet_dim=8, n_mel_channels=8, postnet_embedding_dim=8,
    postnet_n_convolutions=2,
)


def _run(n_steps=4):
    rng_np = np.random.RandomState(0)
    B, T_in, T_out = 2, 10, 12
    batch = Batch(
        text=rng_np.randint(2, 70, (B, T_in)).astype(np.int32),
        input_lengths=np.full((B,), T_in, np.int32),
        mel=rng_np.randn(B, TINY.n_mel_channels, T_out).astype(np.float32),
        gate=np.zeros((B, T_out), np.float32),
        speaker_id=np.zeros((B,), np.int32),
        output_lengths=np.full((B,), T_out, np.int32),
    )
    batch = Batch(*map(jnp.asarray, batch))
    model = Tacotron2(TINY, n_vocab=N_SYMBOLS)
    rng = jax.random.PRNGKey(TINY.seed)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch.text, batch.input_lengths, batch.mel, batch.output_lengths,
    )
    state = create_train_state(TINY, variables)
    step_fn = jax.jit(make_train_step(model, TINY))
    losses = []
    for i in range(n_steps):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    return losses


def test_training_bitwise_repeatable():
    a = _run()
    b = _run()
    assert a == b  # bitwise, not approximately


def test_data_order_is_seed_function(tmp_path):
    from text2speech_tpu.data.npz_dataset import NpzDataFeeder

    d = tmp_path / "c"
    d.mkdir()
    for i in range(6):
        np.savez(
            d / f"u{i}.npz", audio=np.zeros(256), mel=np.zeros((10, 8), np.float32),
            linear=np.zeros((10, 513), np.float32), time_steps=2560,
            mel_frames=10, text="가", tokens=np.asarray([2, 21, 1]), loss_coeff=1,
        )
    f1 = NpzDataFeeder([str(d)], TINY, batch_size=2, shuffle_seed=7)
    f2 = NpzDataFeeder([str(d)], TINY, batch_size=2, shuffle_seed=7)
    b1 = [b.text.tolist() for b in f1.epoch(3)]
    b2 = [b.text.tolist() for b in f2.epoch(3)]
    assert b1 == b2
