"""Optimization sanity: a tiny Tacotron-2 must overfit one fixed batch (loss
drops decisively), and tiny WaveGlow training must push the flow NLL down.
This is the 'gradients actually point downhill through the scan/attention/
flow' test the shape suite can't provide.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from text2speech_tpu.config import HParams, WaveGlowConfig
from text2speech_tpu.data.dataset import Batch
from text2speech_tpu.models.tacotron2 import Tacotron2
from text2speech_tpu.models.losses import waveglow_loss
from text2speech_tpu.models.waveglow import WaveGlow
from text2speech_tpu.text import N_SYMBOLS
from text2speech_tpu.train.state import create_train_state
from text2speech_tpu.train.tacotron import make_train_step

TINY = HParams(
    embedding_size=16,
    enc_conv_num_layers=1,
    enc_conv_channels=16,
    attention_rnn_dim=16,
    decoder_rnn_dim=16,
    attention_dim=8,
    attention_location_n_filters=4,
    attention_location_kernel_size=7,
    prenet_dim=8,
    n_mel_channels=8,
    postnet_embedding_dim=8,
    postnet_n_convolutions=2,
    learning_rate=3e-3,
    warmup_steps=10,
)


def test_tacotron_overfits_one_batch():
    rng_np = np.random.RandomState(0)
    B, T_in, T_out = 4, 12, 16
    batch = Batch(
        text=rng_np.randint(2, 70, (B, T_in)).astype(np.int32),
        input_lengths=np.full((B,), T_in, np.int32),
        # smooth, low-rank target (sines over time) — learnable under the
        # always-on prenet dropout, unlike white noise
        mel=np.stack([
            0.5 * np.sin(
                2 * np.pi
                * np.arange(T_out)[None, :]
                * (np.arange(TINY.n_mel_channels)[:, None] + 1) / T_out
                + b
            )
            for b in range(B)
        ]).astype(np.float32),
        gate=np.zeros((B, T_out), np.float32),
        speaker_id=np.zeros((B,), np.int32),
        output_lengths=np.full((B,), T_out, np.int32),
    )
    batch = Batch(*map(jnp.asarray, batch))

    model = Tacotron2(TINY, n_vocab=N_SYMBOLS)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch.text, batch.input_lengths, batch.mel, batch.output_lengths,
    )
    state = create_train_state(TINY, variables)
    step_fn = jax.jit(make_train_step(model, TINY))

    losses = []
    for i in range(150):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < 0.55 * first, (first, last)


def test_waveglow_nll_decreases():
    cfg = WaveGlowConfig(
        n_mel_channels=8, n_flows=2, n_group=4, n_early_every=4,
        wn_n_layers=2, wn_n_channels=16, upsample_kernel=32,
        upsample_stride=8, segment_length=512, learning_rate=1e-3,
    )
    model = WaveGlow(cfg)
    rng = jax.random.PRNGKey(0)
    frames = cfg.segment_length // cfg.upsample_stride
    rng_np = np.random.RandomState(0)
    mel = jnp.asarray(rng_np.randn(4, cfg.n_mel_channels, frames).astype(np.float32))
    # structured audio (sine) so the flow has something to model
    t = np.arange(cfg.segment_length) / 22050
    audio = jnp.asarray(
        np.stack([0.3 * np.sin(2 * np.pi * (100 + 50 * i) * t) for i in range(4)])
        .astype(np.float32)
    )
    variables = model.init(rng, mel, audio)
    tx = optax.adam(cfg.learning_rate)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            z, log_s, log_det = model.apply({"params": p}, mel, audio)
            return waveglow_loss(z.transpose(0, 2, 1), log_s, log_det, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.1, (
        losses[:3], losses[-3:]
    )
