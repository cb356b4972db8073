"""HTTP streaming front-end (``text2speech_tpu.http_serve``).

Contracts pinned here:

* **Byte-exact serving** — the PCM a client receives over HTTP equals the
  int16 conversion of the same ``(text, seed)`` session run directly
  through a ``ContinuousBatcher`` (the transport adds nothing and drops
  nothing).
* **Concurrency** — simultaneous POSTs stream independent sessions through
  one shared slot batch, each matching its solo reference.
* **Edge behavior** — overlong text is a 400 at submission (the scheduler
  never sees it); ``/stats`` and ``/healthz`` serve while sessions run;
  a client disconnect cancels its session and frees the slot.

The reference has no serving layer (``inference.py:80-95`` is a one-shot
script); these tests pin the network layer added on top of the
continuous batcher.
"""

import http.client
import json
import threading

import numpy as np
import pytest

from text2speech_tpu.http_serve import (float_to_pcm16, make_http_server,
                                        wav_stream_header)
from text2speech_tpu.server import make_server
from tests.test_synthesizer import HP, WG, synthesizer  # noqa: F401

SIGMA = 0.8
TEXTS = ["안녕하세요.", "존경하는 사람과 함께 갑니다.", "네."]


@pytest.fixture(scope="module")
def http_srv(synthesizer):  # noqa: F811
    batcher = make_server(synthesizer, slots=2, chunk_steps=8,
                          max_text_len=80, sigma=SIGMA)
    httpd, runner = make_http_server(batcher, port=0, max_pending=4)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1]
    httpd.shutdown()
    runner.shutdown()


def _solo_pcm(synthesizer, text, seed):  # noqa: F811
    """Reference bytes: the same (text, seed) through a direct batcher."""
    srv = make_server(synthesizer, slots=1, chunk_steps=8, max_text_len=80,
                      sigma=SIGMA)
    wav = srv.run([text], seeds=[seed])[0]
    return float_to_pcm16(wav)


def _post_synthesize(port, text, seed):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", "/synthesize",
                 body=json.dumps({"text": text, "seed": seed}),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp, body


def test_http_stream_matches_direct_run(synthesizer, http_srv):  # noqa: F811
    resp, body = _post_synthesize(http_srv, TEXTS[0], seed=11)
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "audio/wav"
    assert resp.getheader("X-Session-Id") is not None
    header = wav_stream_header(22050)
    assert body[: len(header)] == header
    assert body[len(header):] == _solo_pcm(synthesizer, TEXTS[0], 11)


def test_http_concurrent_sessions(synthesizer, http_srv):  # noqa: F811
    results = {}

    def worker(i):
        _, body = _post_synthesize(http_srv, TEXTS[i], seed=100 + i)
        results[i] = body[len(wav_stream_header(22050)):]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(3):
        assert results[i] == _solo_pcm(synthesizer, TEXTS[i], 100 + i), i


def test_http_per_request_sigma(synthesizer, http_srv):  # noqa: F811
    """A request's "sigma" overrides the server default end-to-end."""
    conn = http.client.HTTPConnection("127.0.0.1", http_srv, timeout=600)
    conn.request("POST", "/synthesize",
                 body=json.dumps({"text": TEXTS[2], "seed": 5,
                                  "sigma": 0.4}))
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    assert resp.status == 200
    srv = make_server(synthesizer, slots=1, chunk_steps=8, max_text_len=80,
                      sigma=SIGMA)
    ref = srv.run([TEXTS[2]], seeds=[5], sigmas=[0.4])[0]
    assert body[len(wav_stream_header(22050)):] == float_to_pcm16(ref)


def test_http_per_request_denoiser(synthesizer):  # noqa: F811
    """A request's "denoiser_strength" streams bias-subtracted audio
    byte-equal to the direct batcher run at that strength; a strength on
    a denoiser-less server is a 400, not a dead scheduler."""
    from text2speech_tpu.infer import Synthesizer

    dkw = dict(filter_length=64, n_overlap=4, win_length=64, n_frames=16)
    synth = Synthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables,
        use_denoiser=True, denoiser_kwargs=dkw,
    )
    batcher = make_server(synth, slots=2, chunk_steps=8, max_text_len=80,
                          sigma=SIGMA)
    httpd, runner = make_http_server(batcher, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/synthesize",
                     body=json.dumps({"text": TEXTS[0], "seed": 9,
                                      "denoiser_strength": 0.05}))
        resp = conn.getresponse()
        body = resp.read()
        conn.close()
        assert resp.status == 200
        ref_srv = make_server(synth, slots=1, chunk_steps=8,
                              max_text_len=80, sigma=SIGMA)
        ref = ref_srv.run([TEXTS[0]], seeds=[9],
                          denoiser_strengths=[0.05])[0]
        assert body[len(wav_stream_header(22050)):] == float_to_pcm16(ref)
    finally:
        httpd.shutdown()
        runner.shutdown()


def test_http_denoiser_on_denoiserless_server_is_400(http_srv):
    conn = http.client.HTTPConnection("127.0.0.1", http_srv, timeout=600)
    conn.request("POST", "/synthesize",
                 body=json.dumps({"text": TEXTS[2],
                                  "denoiser_strength": 0.1}))
    resp = conn.getresponse()
    err = json.loads(resp.read())
    conn.close()
    assert resp.status == 400
    assert "denoiser" in err["error"]


def test_http_overlong_text_is_400(http_srv):
    long_text = "아주 " * 200 + "긴 문장입니다."
    resp, body = _post_synthesize(http_srv, long_text, seed=1)
    assert resp.status == 400
    assert "max_text_len" in json.loads(body)["error"]


def test_http_stats_and_health(http_srv):
    _post_synthesize(http_srv, TEXTS[2], seed=3)   # ensure >=1 completion
    conn = http.client.HTTPConnection("127.0.0.1", http_srv, timeout=60)
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    assert r.status == 200 and json.loads(r.read())["ok"]
    conn.request("GET", "/stats")
    r = conn.getresponse()
    stats = json.loads(r.read())
    conn.close()
    assert stats["slots"] == 2
    assert stats["completed"] >= 1
    assert stats["open_streams"] == 0


def test_http_disconnect_cancels(synthesizer, http_srv):  # noqa: F811
    """Closing the connection mid-stream frees the session's slot."""
    conn = http.client.HTTPConnection("127.0.0.1", http_srv, timeout=600)
    conn.request("POST", "/synthesize",
                 body=json.dumps({"text": TEXTS[1], "seed": 7}),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    resp.read(len(wav_stream_header(22050)) + 2)   # first bytes arrived
    conn.close()                                   # hang up mid-stream

    # the server keeps serving: a fresh full request still matches solo
    resp2, body2 = _post_synthesize(http_srv, TEXTS[2], seed=8)
    assert resp2.status == 200
    assert body2[len(wav_stream_header(22050)):] == _solo_pcm(
        synthesizer, TEXTS[2], 8)


def test_http_rejects_bad_json(http_srv):
    conn = http.client.HTTPConnection("127.0.0.1", http_srv, timeout=60)
    for body in (b"not json", b"[1, 2]", b"123"):
        conn.request("POST", "/synthesize", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400, body
        r.read()
    conn.request("POST", "/nope", body=b"{}")
    r = conn.getresponse()
    assert r.status == 404
    r.read()
    conn.close()


def test_http_rejects_malformed_seed_and_sigma(http_srv):
    """Bad seed/sigma are 400 at admission — the scheduler thread never
    sees them (a crashed scheduler would strand every other client)."""
    resp, body = _post_synthesize(http_srv, TEXTS[2], seed="abc")
    assert resp.status == 400 and b"seed" in body
    conn = http.client.HTTPConnection("127.0.0.1", http_srv, timeout=60)
    conn.request("POST", "/synthesize",
                 body=json.dumps({"text": TEXTS[2], "sigma": "hot"}))
    r = conn.getresponse()
    assert r.status == 400 and b"sigma" in r.read()
    # the server still serves fine afterwards
    conn.request("GET", "/healthz")
    assert conn.getresponse().status == 200
    conn.close()


@pytest.mark.slow
def test_http_soak_concurrent_disconnects_reload_under_load(synthesizer):  # noqa: F811
    """HTTP-level soak (randomized load against the REAL server): eight
    concurrent clients with mixed seeds/sigmas/denoiser strengths, three
    of them hanging up mid-stream, and a /reload (same weights, so byte
    expectations survive) landing while sessions are in flight.  Asserts
    no session cross-talk — every completed stream byte-matches a solo
    direct-batcher run of its own (text, seed, sigma, strength) — and
    clean terminator semantics: ``http.client`` raises IncompleteRead on
    a stream that dies without the chunked terminator, so an exception-
    free full read IS the terminator check."""
    from text2speech_tpu.infer import Synthesizer

    dkw = dict(filter_length=64, n_overlap=4, win_length=64, n_frames=16)
    synth = Synthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables,
        use_denoiser=True, denoiser_kwargs=dkw,
    )
    batcher = make_server(synth, slots=2, chunk_steps=8, max_text_len=80,
                          sigma=SIGMA)
    httpd, runner = make_http_server(
        batcher, port=0,
        reload_fn=lambda: synth.load_weights(
            synthesizer.taco_variables, synthesizer.wg_variables))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]

    sigmas = [0.5, 0.8, 1.0]
    strengths = [None, 0.0, 0.05]
    jobs = []
    for i in range(8):
        jobs.append({
            "text": TEXTS[i % len(TEXTS)], "seed": 1000 + 13 * i,
            "sigma": sigmas[i % 3], "strength": strengths[i % 3],
            "disconnect": i % 3 == 2,     # clients 2, 5 hang up mid-stream
        })
    results: dict[int, object] = {}

    def client(i, job):
        req = {"text": job["text"], "seed": job["seed"],
               "sigma": job["sigma"]}
        if job["strength"] is not None:
            req["denoiser_strength"] = job["strength"]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        try:
            conn.request("POST", "/synthesize", body=json.dumps(req))
            resp = conn.getresponse()
            if resp.status != 200:
                results[i] = ("status", resp.status, resp.read())
                return
            if job["disconnect"]:
                resp.read(len(wav_stream_header(22050)) + 4)
                results[i] = ("disconnected", None)
                return            # conn.close() in finally = mid-stream RST
            results[i] = ("ok", resp.read())   # raises on truncation
        except Exception as e:    # noqa: BLE001 — recorded, asserted below
            results[i] = ("error", repr(e))
        finally:
            conn.close()

    threads = [threading.Thread(target=client, args=(i, j))
               for i, j in enumerate(jobs)]
    for t in threads[:5]:
        t.start()
    # /reload lands while those sessions stream
    rconn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    rconn.request("POST", "/reload", body=b"{}")
    assert rconn.getresponse().status == 200
    rconn.close()
    for t in threads[5:]:
        t.start()
    for t in threads:
        t.join()

    try:
        solo_cache: dict[tuple, bytes] = {}

        def solo(job) -> bytes:
            key = (job["text"], job["seed"], job["sigma"], job["strength"])
            if key not in solo_cache:
                srv = make_server(synth, slots=1, chunk_steps=8,
                                  max_text_len=80, sigma=SIGMA)
                wav = srv.run([job["text"]], seeds=[job["seed"]],
                              sigmas=[job["sigma"]],
                              denoiser_strengths=[job["strength"]])[0]
                solo_cache[key] = float_to_pcm16(wav)
            return solo_cache[key]

        hdr = len(wav_stream_header(22050))
        for i, job in enumerate(jobs):
            kind = results[i][0]
            if job["disconnect"]:
                assert kind == "disconnected", (i, results[i])
            else:
                assert kind == "ok", (i, results[i])
                assert results[i][1][hdr:] == solo(job), f"client {i}"
        # scheduler survived everything; slots all freed
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        conn.close()
        assert stats["open_streams"] == 0
        assert stats["completed"] >= 5
    finally:
        httpd.shutdown()
        runner.shutdown()


def test_http_reload_not_configured_is_404(http_srv):
    conn = http.client.HTTPConnection("127.0.0.1", http_srv, timeout=60)
    conn.request("POST", "/reload", body=b"{}")
    r = conn.getresponse()
    assert r.status == 404
    r.read()
    conn.close()


def test_http_live_checkpoint_swap(synthesizer):  # noqa: F811
    """POST /reload swaps weights under the running server (executed on
    the scheduler thread): the same (text, seed) then reproduces a direct
    batcher run over the NEW weights."""
    import jax
    import jax.numpy as jnp

    from text2speech_tpu.infer import Synthesizer

    synth = Synthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables, use_denoiser=False,
    )
    prng = np.random.RandomState(7)
    perturb = lambda tree: jax.tree.map(
        lambda x: (x + (0.03 * prng.randn(*x.shape)).astype(x.dtype))
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )
    new_tv = perturb(synthesizer.taco_variables)
    new_wv = perturb(synthesizer.wg_variables)

    httpd, runner = make_http_server(
        make_server(synth, slots=1, chunk_steps=8, max_text_len=80,
                    sigma=SIGMA),
        port=0,
        reload_fn=lambda which: synth.load_weights(new_tv, new_wv))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    try:
        _, before = _post_synthesize(port, TEXTS[0], seed=9)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/reload",
                     body=json.dumps({"which": "new"}))
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read())["ok"]
        # bad kwargs -> 400, server still fine
        conn.request("POST", "/reload", body=json.dumps({"nope": 1}))
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.close()
        _, after = _post_synthesize(port, TEXTS[0], seed=9)
        assert after != before                      # weights actually live

        ref_synth = Synthesizer(
            hp=synthesizer.hp, taco=synthesizer.taco,
            taco_variables=new_tv,
            wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
            wg_variables=new_wv, use_denoiser=False,
        )
        ref = make_server(ref_synth, slots=1, chunk_steps=8,
                          max_text_len=80, sigma=SIGMA).run(
            [TEXTS[0]], seeds=[9])[0]
        assert after[len(wav_stream_header(22050)):] == float_to_pcm16(ref)
    finally:
        httpd.shutdown()
        runner.shutdown()


def test_http_over_tp_server(synthesizer):  # noqa: F811
    """The HTTP layer is batcher-agnostic: serving over make_server_tp
    (TP decode + TP vocoder on an 8-device mesh) streams the same bytes
    as the direct TP batcher run."""
    import jax
    from jax.sharding import Mesh

    from text2speech_tpu.parallel.serve import TPSynthesizer
    from text2speech_tpu.server import make_server_tp

    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("model",))
    mk_tps = lambda: TPSynthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables,
        mesh=mesh, data_axis=None, chunk_steps=8,
    )
    tps = mk_tps()
    httpd, runner = make_http_server(
        make_server_tp(tps, slots=2, chunk_steps=8, max_text_len=80,
                       sigma=SIGMA),
        port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        resp, body = _post_synthesize(
            httpd.server_address[1], TEXTS[0], seed=11)
        assert resp.status == 200
        ref = make_server_tp(mk_tps(), slots=1, chunk_steps=8,
                             max_text_len=80, sigma=SIGMA).run(
            [TEXTS[0]], seeds=[11])[0]
        assert body[len(wav_stream_header(22050)):] == float_to_pcm16(ref)
    finally:
        httpd.shutdown()
        runner.shutdown()


def test_pcm16_conversion_matches_reference_rule():
    x = np.array([0.0, 1.0, -1.0, 2.0, -2.0, 0.5], np.float32)
    out = np.frombuffer(float_to_pcm16(x), "<i2")
    np.testing.assert_array_equal(
        out, np.array([0, 32767, -32767, 32767, -32767, 16383], np.int16))
