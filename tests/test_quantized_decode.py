"""Weight-quantized serving decode (models/tacotron_serve.py): the fp serve
path must be bitwise the flax decode_chunk (same carry, same dropout-key
consumption), and the int8 path must track it closely — the serving mode
that halves the measured weight-streaming bound (bench.py bench_tacotron
notes; the decoder streams ~36 MB bf16/step vs 779 GB/s HBM)."""

import numpy as np

import jax
import jax.numpy as jnp

from text2speech_tpu.models.tacotron2 import DecoderState, Tacotron2
from text2speech_tpu.models.tacotron_serve import (
    decode_chunk_serve,
    extract_decoder_params,
    quantize_decoder_params,
)
from text2speech_tpu.text import N_SYMBOLS
from tests.test_synthesizer import HP


def _setup():
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
    return model, variables, memory, pmem, state, frame, finished, lengths, rngs


def test_serve_fp_path_matches_flax_decode_chunk():
    (model, variables, memory, pmem, state, frame, finished, lengths,
     rngs) = _setup()
    (st_a, fr_a, fin_a), mel_a, gate_a, align_a, act_a = model.apply(
        variables, memory, state, frame, finished, rngs,
        text_lengths=lengths, method=Tacotron2.decode_chunk,
    )
    dp = extract_decoder_params(variables, HP)
    (st_b, fr_b, fin_b), mel_b, gate_b, align_b, act_b = decode_chunk_serve(
        dp, HP, memory, pmem, state, frame, finished, rngs,
        text_lengths=lengths,
    )
    # BITWISE: the serving path reproduces flax op-for-op, including the
    # (x@W_ih + b_ih) + (h@W_hh + b_hh) LSTM bias association (fp addition
    # is non-associative — a different grouping could flip a gate decision
    # one ulp from the threshold)
    np.testing.assert_array_equal(np.asarray(mel_a), np.asarray(mel_b))
    np.testing.assert_array_equal(np.asarray(gate_a), np.asarray(gate_b))
    np.testing.assert_array_equal(np.asarray(align_a), np.asarray(align_b))
    np.testing.assert_array_equal(np.asarray(act_a), np.asarray(act_b))
    np.testing.assert_array_equal(np.asarray(fin_a), np.asarray(fin_b))
    for a, b in zip(st_a, st_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serve_int8_path_tracks_fp():
    (model, variables, memory, pmem, state, frame, finished, lengths,
     rngs) = _setup()
    dp = extract_decoder_params(variables, HP)
    _, mel_fp, gate_fp, _, _ = decode_chunk_serve(
        dp, HP, memory, pmem, state, frame, finished, rngs,
        text_lengths=lengths,
    )
    # quantize everything 2-D for the test (the tiny model's kernels are
    # all below the production size threshold)
    qp = quantize_decoder_params(dp, min_elems=1)
    assert any(isinstance(v, dict) for v in qp.values()), "nothing quantized"
    _, mel_q, gate_q, _, _ = decode_chunk_serve(
        qp, HP, memory, pmem, state, frame, finished, rngs,
        text_lengths=lengths,
    )
    assert np.isfinite(np.asarray(mel_q)).all()
    # per-channel int8 keeps the trajectories close on this horizon
    err = np.abs(np.asarray(mel_q) - np.asarray(mel_fp)).mean()
    scale = np.abs(np.asarray(mel_fp)).mean() + 1e-6
    assert err / scale < 0.2, (err, scale)


def test_synthesizer_quantized_streaming(monkeypatch):
    """Synthesizer(quantized_decode=True) streams finite audio through the
    int8 decode path and stays deterministic.  (The measured-benefit
    precision policy would route this B=1 stream to bf16; force the
    crossover down so the test keeps exercising the int8 kernels.)"""
    monkeypatch.setattr(
        "text2speech_tpu.models.tacotron_serve.INT8_DECODE_MIN_BATCH", 1)
    import jax
    import jax.numpy as jnp

    from text2speech_tpu.infer import Synthesizer
    from text2speech_tpu.models.waveglow import WaveGlow
    from tests.test_synthesizer import WG

    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(HP, n_vocab=N_SYMBOLS)
    tvars = taco.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, HP.n_mel_channels, 8)), jnp.asarray([8]),
    )
    wg = WaveGlow(WG)
    wvars = wg.init(
        rng, jnp.zeros((1, WG.n_mel_channels, 16)),
        jnp.zeros((1, 16 * WG.upsample_stride)),
    )
    synth = Synthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables={"params": wvars["params"]},
        use_denoiser=False, quantized_decode=True,
    )
    a = np.concatenate(list(synth.synthesize_incremental(
        "안녕하세요.", seed=4, chunk_steps=8
    )))
    assert a.size > 0 and np.isfinite(a).all()
    b = np.concatenate(list(synth.synthesize_incremental(
        "안녕하세요.", seed=4, chunk_steps=8
    )))
    np.testing.assert_array_equal(a, b)
