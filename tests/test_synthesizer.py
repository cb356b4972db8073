"""End-to-end Synthesizer tests (text -> mel -> waveform -> wav file) with
tiny random-weight models: batching, length trimming, denoiser path, file IO.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text2speech_tpu.config import HParams, WaveGlowConfig
from text2speech_tpu.infer import Synthesizer
from text2speech_tpu.models.tacotron2 import Tacotron2
from text2speech_tpu.models.waveglow import WaveGlow
from text2speech_tpu.text import N_SYMBOLS

HP = HParams(
    sample_rate=22050,
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
    max_decoder_steps=20,
)
WG = WaveGlowConfig(
    n_mel_channels=8, n_flows=2, n_group=4, n_early_every=4,
    wn_n_layers=2, wn_n_channels=16, upsample_kernel=64, upsample_stride=16,
    sampling_rate=22050, hop_length=16,
)


@pytest.fixture(scope="module")
def synthesizer():
    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(HP, n_vocab=N_SYMBOLS)
    tvars = taco.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, HP.n_mel_channels, 8)), jnp.asarray([8]),
    )
    wg = WaveGlow(WG)
    frames = 16
    wvars = wg.init(
        rng,
        jnp.zeros((1, WG.n_mel_channels, frames)),
        jnp.zeros((1, frames * WG.upsample_stride)),
    )
    # perturb the zero-init end convs so the vocoder output actually
    # depends on the mel/noise windows (the streaming equivalence tests
    # are otherwise blind to the window logic; r3 code-review finding)
    prng = np.random.RandomState(1)
    wparams = jax.tree.map(
        lambda x: x + 0.01 * prng.randn(*x.shape).astype(np.float32),
        wvars["params"],
    )
    return Synthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables={"params": wparams},
        use_denoiser=False,
    )


def test_text_to_mel(synthesizer):
    mel, lengths = synthesizer.text_to_mel(["안녕하세요.", "존경하는 사람"])
    assert mel.shape[0] == 2 and mel.shape[1] == HP.n_mel_channels
    assert np.isfinite(np.asarray(mel)).all()
    assert (np.asarray(lengths) >= 1).all()


def test_synthesize_batch_trims_lengths(synthesizer):
    wavs = synthesizer.synthesize(["안녕하세요.", "네."])
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and np.isfinite(w).all()
    # the trim unit is what the vocoder EMITS per mel frame
    # (upsample_stride), not the analysis hop — same seed reproduces the
    # same out_lengths, so each waveform is exactly out_len frames of audio
    _, out_len = synthesizer.text_to_mel(["안녕하세요.", "네."])
    for w, n in zip(wavs, np.asarray(out_len)):
        assert len(w) == int(n) * WG.upsample_stride


def test_synthesize_to_files(synthesizer, tmp_path):
    paths = [str(tmp_path / "a.wav"), str(tmp_path / "b.wav")]
    synthesizer.synthesize_to_files(["안녕하세요.", "네."], paths)
    from scipy.io import wavfile

    for p in paths:
        sr, data = wavfile.read(p)
        assert sr == WG.sampling_rate
        assert data.dtype == np.int16 and len(data) > 0


def test_denoiser_path():
    from text2speech_tpu.models.denoiser import make_denoiser

    wg = WaveGlow(WG)
    rng = jax.random.PRNGKey(0)
    frames = 16
    wvars = wg.init(
        rng,
        jnp.zeros((1, WG.n_mel_channels, frames)),
        jnp.zeros((1, frames * WG.upsample_stride)),
    )
    bias_spec, denoise = make_denoiser(
        wg, wvars, filter_length=256, win_length=256, n_frames=16
    )
    assert np.isfinite(np.asarray(bias_spec)).all()
    audio = jnp.asarray(
        np.random.RandomState(0).randn(1, 4096).astype(np.float32)
    )
    out = denoise(audio, 0.1)
    assert np.isfinite(np.asarray(out)).all()
    assert out.shape[0] == 1


def test_load_synthesizer_from_checkpoints(tmp_path):
    """Orbax checkpoints for both models -> load_synthesizer -> synthesis
    (the inference.py CLI path end to end, minus argparse)."""
    import optax

    from text2speech_tpu.infer import load_synthesizer
    from text2speech_tpu.train.checkpoint import CheckpointManager
    from text2speech_tpu.train.state import TrainState, create_train_state

    rng = jax.random.PRNGKey(0)

    taco = Tacotron2(HP, n_vocab=N_SYMBOLS)
    tvars = taco.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, HP.n_mel_channels, 8)), jnp.asarray([8]),
    )
    tstate = create_train_state(HP, tvars)
    tdir = str(tmp_path / "taco")
    m1 = CheckpointManager(tdir)
    m1.save(5, tstate, wait=True)

    wg = WaveGlow(WG)
    frames = WG.segment_length // WG.hop_length + 1
    wvars = jax.jit(wg.init)(
        rng,
        jnp.zeros((1, WG.n_mel_channels, frames)),
        jnp.zeros((1, WG.segment_length)),
    )
    tx = optax.adam(WG.learning_rate)
    wstate = TrainState(
        step=jnp.zeros((), jnp.int32), params=wvars["params"],
        batch_stats={}, opt_state=tx.init(wvars["params"]), tx=tx,
    )
    wdir = str(tmp_path / "wg")
    m2 = CheckpointManager(wdir)
    m2.save(7, wstate, wait=True)

    synth = load_synthesizer(HP, tdir, WG, wdir, use_denoiser=False)
    wavs = synth.synthesize(["안녕하세요."])
    assert len(wavs) == 1 and np.isfinite(wavs[0]).all() and len(wavs[0]) > 0
    # loaded params must equal the saved ones
    same = jax.tree.map(
        lambda a, c: bool(jnp.allclose(a, c)),
        synth.wg_variables["params"], wstate.params,
    )
    assert all(jax.tree.leaves(same))


def test_fused_vocoder_option():
    """use_fused_vocoder routes mel->audio through the fused Pallas path
    (interpret mode on CPU)."""
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
        use_denoiser=False, use_fused_vocoder=True,
    )
    wavs = synth.synthesize(["안녕."])
    assert len(wavs) == 1 and np.isfinite(wavs[0]).all() and len(wavs[0]) > 0


def test_int8_vocoder_option(synthesizer):
    """int8_vocoder quantizes once at construction and routes mel->audio
    (plus the incremental/streaming vocode windows) through the int8
    kernels; output tracks the fp synthesizer's for the same seed."""
    synth8 = Synthesizer(
        hp=HP, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=WG, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables,
        use_denoiser=False, int8_vocoder=True,
    )
    # compare against the bf16 FUSED path: it draws noise at the same
    # tile-rounded shapes as the int8 path, so the same seed gives the
    # same draws (the unfused path draws at the true length — different
    # noise, not comparable samplewise)
    synth_f = Synthesizer(
        hp=HP, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=WG, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables,
        use_denoiser=False, use_fused_vocoder=True,
    )
    ref = synth_f.synthesize(["안녕."], seed=3)
    got = synth8.synthesize(["안녕."], seed=3)
    assert len(got) == 1 and np.isfinite(got[0]).all()
    assert got[0].shape == ref[0].shape
    # same decode, same noise seed -> int8 audio stays close to fp audio
    denom = np.linalg.norm(ref[0]) + 1e-9
    assert np.linalg.norm(got[0] - ref[0]) / denom < 0.15

    # incremental streaming composes with the int8 window vocoder
    chunks = list(synth8.synthesize_incremental("안녕.", chunk_steps=8))
    stream = np.concatenate(chunks)
    assert np.isfinite(stream).all() and stream.size > 0

    # ...and so does multi-stream streaming: per-row int8 chunks track the
    # fp batch engine's for the same seed (identical decode + noise draws)
    texts = ["안녕.", "네."]
    rows8 = {r: [] for r in range(len(texts))}
    for r, ch in synth8.synthesize_incremental_batch(texts, seed=3,
                                                     chunk_steps=8):
        rows8[r].append(ch)
    rows_f = {r: [] for r in range(len(texts))}
    for r, ch in synth_f.synthesize_incremental_batch(texts, seed=3,
                                                      chunk_steps=8):
        rows_f[r].append(ch)
    for r in range(len(texts)):
        a, b = np.concatenate(rows8[r]), np.concatenate(rows_f[r])
        assert a.shape == b.shape and np.isfinite(a).all()
        assert np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9) < 0.15


def test_load_synthesizer_without_vocoder_checkpoint(tmp_path):
    """wg_ckpt_dir=None supports the Griffin-Lim (mel-only) CLI path."""
    import optax

    from text2speech_tpu.infer import load_synthesizer
    from text2speech_tpu.train.checkpoint import CheckpointManager
    from text2speech_tpu.train.state import create_train_state

    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(HP, n_vocab=N_SYMBOLS)
    tvars = taco.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, HP.n_mel_channels, 8)), jnp.asarray([8]),
    )
    tdir = str(tmp_path / "taco")
    CheckpointManager(tdir).save(1, create_train_state(HP, tvars), wait=True)

    synth = load_synthesizer(HP, tdir, WG, None, use_denoiser=False)
    mel, lengths = synth.text_to_mel(["안녕하세요."])
    assert np.isfinite(np.asarray(mel)).all() and int(lengths[0]) >= 1


def test_synthesize_stream(synthesizer):
    """Long-form text streams sentence-by-sentence in reading order,
    batched max_batch at a time (first audio after one batch, not after
    the whole document)."""
    text = "안녕하세요. 존경하는 사람. 네. 오늘 날씨가 좋다. 감사합니다."
    got = list(synthesizer.synthesize_stream(text, max_batch=2))
    assert len(got) == 5
    sents = [s for s, _ in got]
    assert sents[0] == "안녕하세요." and sents[-1] == "감사합니다."
    for _, wav in got:
        assert wav.ndim == 1 and wav.size > 0 and np.isfinite(wav).all()
    # deterministic across calls
    again = list(synthesizer.synthesize_stream(text, max_batch=2))
    for (_, a), (_, b) in zip(got, again):
        np.testing.assert_array_equal(a, b)
