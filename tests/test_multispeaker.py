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
