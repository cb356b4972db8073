"""Continuous-batching streaming server (``text2speech_tpu.server``).

Contracts pinned here:

* **Single-pass equivalence** — a session's concatenated audio equals one
  single-pass vocode of its final mel with its own noise stream (the same
  invariant the lockstep streaming engine pins in ``test_streaming``).
* **Join independence** — a session's output depends only on
  ``(text, seed)``: the same request through a loaded multi-slot server
  (admitted mid-flight into a recycled slot) equals a dedicated
  single-slot server run.  This is what per-row decode keys buy.
* **Continuous admission** — more requests than slots all complete, and
  slots are reused (rounds with recycled slots actually decode the new
  session, not the stale row).
* **Early-gate staggering** (toy-driven, exact arithmetic) — a fast
  session flushes and frees its slot while a slow one is still decoding;
  the freed slot admits the next queued request; per-session audio is
  exactly the toy single-pass result, post-stop garbage excluded.

Reference behavior served: ``tacotron/tacotron.py:431-466`` +
``inference.py:80-95`` re-architected as a multi-session scheduler (the
reference synthesizes one request at a time and has no serving layer).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text2speech_tpu.server import ContinuousBatcher, make_server
from tests.test_synthesizer import HP, WG, synthesizer  # noqa: F401


TEXTS = ["안녕하세요.", "존경하는 사람과 함께 갑니다.", "네.", "반갑습니다.",
         "오늘 날씨가 좋네요."]


def _single_pass(synth, srv, sid, sigma):
    """Reference: one vocode of the session's final mel with its noise."""
    from text2speech_tpu.models.waveglow import WaveGlow

    s = srv.sessions[sid]
    gpf = WG.upsample_stride // WG.n_group
    tl = min(s.out_len, srv.requested)
    post = s.post_cat()[:, :tl]
    comps = srv._sess_noise(s, tl)
    nz = tuple(jnp.asarray(c[None, : tl * gpf]) for c in comps)
    return np.asarray(synth.waveglow.apply(
        synth.wg_variables, jnp.asarray(post[None]), None, sigma,
        noise=nz, method=WaveGlow.infer))[0]


def test_server_sessions_match_single_pass(synthesizer):  # noqa: F811
    """More sessions than slots; every session's streamed audio equals a
    single-pass vocode of its own mel/noise."""
    sigma = 0.8
    srv = make_server(synthesizer, slots=2, chunk_steps=8, max_text_len=80,
                      sigma=sigma, retain_sessions=True)
    wavs = srv.run(TEXTS)
    assert sorted(wavs) == list(range(len(TEXTS)))
    assert srv.stats["admitted"] == len(TEXTS)
    assert srv.idle
    for sid, wav in wavs.items():
        ref = _single_pass(synthesizer, srv, sid, sigma)
        assert wav.shape == ref.shape, (sid, wav.shape, ref.shape)
        np.testing.assert_allclose(wav, ref, atol=3e-4, err_msg=f"sid {sid}")


def test_server_join_independence(synthesizer):  # noqa: F811
    """The same (text, seed) produces the same audio whether it runs alone
    in a 1-slot server or is admitted mid-flight into a busy server."""
    sigma = 0.8
    srv = make_server(synthesizer, slots=2, chunk_steps=8, max_text_len=80,
                      sigma=sigma, retain_sessions=True)
    # five requests into two slots: sids 2..4 join recycled slots
    seeds = [11, 22, 33, 44, 55]
    wavs = srv.run(TEXTS, seeds=seeds)

    for i in (0, 2, 4):   # fresh slot, first recycled join, later join
        solo = make_server(synthesizer, slots=1, chunk_steps=8,
                           max_text_len=80, sigma=sigma)
        ref = solo.run([TEXTS[i]], seeds=[seeds[i]])[0]
        np.testing.assert_allclose(wavs[i], ref, atol=3e-4,
                                   err_msg=f"text {i}")


def test_server_quantized_decode(synthesizer, monkeypatch):  # noqa: F811
    """The int8-decoder serving path drives the same scheduler; sessions
    complete with finite audio of gate-or-contract length.  (Precision
    policy would route 2 slots to bf16; force the crossover down so the
    int8 scheduler path stays exercised.)"""
    from text2speech_tpu.infer import Synthesizer

    monkeypatch.setattr(
        "text2speech_tpu.models.tacotron_serve.INT8_DECODE_MIN_BATCH", 1)

    q = Synthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables, use_denoiser=False,
        quantized_decode=True,
    )
    srv = make_server(q, slots=2, chunk_steps=8, max_text_len=80,
                      retain_sessions=True)
    wavs = srv.run(TEXTS[:3])
    hop = WG.upsample_stride
    for sid, wav in wavs.items():
        s = srv.sessions[sid]
        tl = min(s.out_len, srv.requested)
        assert wav.shape == (tl * hop,)
        assert np.isfinite(wav).all()


def test_server_int8_decode_precision_selection(synthesizer, monkeypatch):  # noqa: F811
    """Measured-benefit precision selection (VERDICT r3 #1): below the
    int8-decode crossover batch, a quantized server serves the bf16
    decode path — BITWISE the plain server (the fp serve path is bitwise
    the flax decode) — so ``int8=True`` never makes decode slower or
    noisier at small batch.  Forcing the crossover down flips the same
    server construction to the int8 kernels (outputs change)."""
    from text2speech_tpu.infer import Synthesizer

    q = Synthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables, use_denoiser=False,
        quantized_decode=True,
    )
    seeds = [1, 2]
    # 2 slots < INT8_DECODE_MIN_BATCH -> the bf16 path serves
    wq = make_server(q, slots=2, chunk_steps=8, max_text_len=80).run(
        TEXTS[:2], seeds=seeds)
    wf = make_server(synthesizer, slots=2, chunk_steps=8,
                     max_text_len=80).run(TEXTS[:2], seeds=seeds)
    for sid in wf:
        np.testing.assert_array_equal(wq[sid], wf[sid], err_msg=f"sid {sid}")

    monkeypatch.setattr(
        "text2speech_tpu.models.tacotron_serve.INT8_DECODE_MIN_BATCH", 1)
    # also force REAL quantization (tiny test kernels sit under the size
    # floor, where "int8" params are identity) — rebuilt synth so the
    # cached _dp_q requantizes
    monkeypatch.setattr(
        "text2speech_tpu.models.tacotron_serve.QUANT_MIN_ELEMS", 1)
    q2 = Synthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables, use_denoiser=False,
        quantized_decode=True,
    )
    wq2 = make_server(q2, slots=2, chunk_steps=8, max_text_len=80).run(
        TEXTS[:2], seeds=seeds)
    assert any(
        wq2[sid].shape != wf[sid].shape or not np.array_equal(wq2[sid], wf[sid])
        for sid in wf
    ), "int8 kernels did not engage with the crossover forced down"


def test_server_per_session_sigma(synthesizer):  # noqa: F811
    """Each session can carry its own flow temperature (the reference
    CLI's quality knob): vocoder calls group by sigma, and every session
    equals a single-pass vocode at ITS sigma."""
    sigmas = [0.5, 0.8, 1.0]
    srv = make_server(synthesizer, slots=2, chunk_steps=8, max_text_len=80,
                      sigma=0.8, retain_sessions=True)
    wavs = srv.run(TEXTS[:3], seeds=[1, 2, 3], sigmas=sigmas)
    for sid, sg in enumerate(sigmas):
        ref = _single_pass(synthesizer, srv, sid, sg)
        np.testing.assert_allclose(wavs[sid], ref, atol=3e-4,
                                   err_msg=f"sid {sid} sigma {sg}")
    # the knob is live: the same session at the server default differs
    wrong = _single_pass(synthesizer, srv, 0, 0.8)
    assert np.abs(wavs[0] - wrong).max() > 1e-3


def test_server_batched_noise_prefetch_exact(synthesizer):  # noqa: F811
    """The one-dispatch-per-round batched noise prefetch produces BITWISE
    the per-session lazy draws (vmap over keys == per-key draws): a server
    with the prefetch disabled emits identical audio."""
    mk = lambda: make_server(synthesizer, slots=2, chunk_steps=8,
                             max_text_len=80, sigma=0.8)
    a = mk()
    b = mk()
    b._draw_noise_batch_fn = None          # lazy per-session fallback only
    wa = a.run(TEXTS[:3], seeds=[1, 2, 3])
    wb = b.run(TEXTS[:3], seeds=[1, 2, 3])
    for sid in wa:
        np.testing.assert_array_equal(wa[sid], wb[sid], err_msg=f"sid {sid}")


def test_server_submit_validates_inputs(synthesizer):  # noqa: F811
    """Malformed seed/sigma raise at submit() like overlong text does —
    nothing invalid may reach step()'s jitted paths."""
    srv = make_server(synthesizer, slots=1, chunk_steps=8, max_text_len=80)
    for bad in ("abc", 1.5, -1, 2**40, True):
        with pytest.raises(ValueError, match="seed"):
            srv.submit("네.", seed=bad)
    for bad in ("hot", float("nan"), -0.1, False):
        with pytest.raises(ValueError, match="sigma"):
            srv.submit("네.", sigma=bad)
    assert srv.idle


def test_server_rejects_overlong_text(synthesizer):  # noqa: F811
    """Invalid requests fail at submit() — never inside step(), which must
    stay up for the other sessions (the HTTP front-end maps this to 400)."""
    srv = make_server(synthesizer, slots=1, chunk_steps=8, max_text_len=8)
    with pytest.raises(ValueError, match="max_text_len"):
        srv.submit("아주 아주 아주 긴 문장입니다.")
    assert srv.idle
    srv.step()   # the server is unaffected


def test_server_checkpoint_swap_recompile_free(synthesizer):  # noqa: F811
    """Synthesizer.load_weights swaps checkpoints under a running server:
    the next session serves the new weights and NO jitted program
    recompiles (params are jit arguments everywhere)."""
    from text2speech_tpu.infer import Synthesizer

    synth = Synthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables, use_denoiser=False,
    )
    srv = make_server(synth, slots=1, chunk_steps=8, max_text_len=80,
                      retain_sessions=True)
    w0 = next(iter(srv.run([TEXTS[0]], seeds=[5]).values()))
    caches = lambda: (synth._decode_chunk._cache_size(),
                      synth._vocode_window._cache_size(),
                      synth._postnet_window._cache_size(),
                      synth._encode_mem._cache_size())
    c0 = caches()
    # With leaked trace state the fastpath never stores, both reads would
    # be all-zero, and the recompile pin below would pass TRIVIALLY.
    from jax._src import core as _jcore
    assert _jcore.trace_state_clean() and any(c0), c0

    prng = np.random.RandomState(3)
    perturb = lambda tree: jax.tree.map(
        lambda x: (x + (0.03 * prng.randn(*x.shape)).astype(x.dtype))
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )
    synth.load_weights(perturb(synthesizer.taco_variables),
                       perturb(synthesizer.wg_variables))

    # same (text, seed), new weights
    w1 = next(iter(srv.run([TEXTS[0]], seeds=[5]).values()))
    assert w1.shape != w0.shape or not np.allclose(w1, w0, atol=1e-5)
    assert caches() == c0, (caches(), c0)


def test_server_int8_vocoder_composes(synthesizer):  # noqa: F811
    """The int8 fused-vocoder serving path drives the same scheduler
    (windows through infer_fused_int8; Pallas auto-interprets on CPU)."""
    from text2speech_tpu.infer import Synthesizer

    q = Synthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables, use_denoiser=False,
        int8_vocoder=True,
    )
    srv = make_server(q, slots=2, chunk_steps=8, max_text_len=80,
                      retain_sessions=True)
    wavs = srv.run(TEXTS[:2], seeds=[1, 2])
    ref = make_server(synthesizer, slots=2, chunk_steps=8, max_text_len=80,
                      retain_sessions=True).run(TEXTS[:2], seeds=[1, 2])
    for sid, wav in wavs.items():
        assert wav.shape == ref[sid].shape
        assert np.isfinite(wav).all() and np.abs(wav).max() > 0
        # same decode; vocoder differs only by the quantization band
        rel = (np.linalg.norm(wav - ref[sid])
               / max(np.linalg.norm(ref[sid]), 1e-9))
        assert rel < 0.5, rel


def test_server_per_request_denoiser(synthesizer):  # noqa: F811
    """Per-request ``denoiser_strength`` (the reference's ``-d`` knob,
    ``waveglow/denoiser.py:35-40`` applied at synthesis time) through the
    continuous-batching server: a denoising session's streamed audio
    equals the OFFLINE CLI denoiser (``Synthesizer._denoise``) applied to
    the session's raw audio; strength-0 sessions are untouched; mixed
    strengths share the batch."""
    from text2speech_tpu.infer import Synthesizer

    dkw = dict(filter_length=64, n_overlap=4, win_length=64, n_frames=16)
    synth = Synthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables,
        use_denoiser=True, denoiser_kwargs=dkw,
    )
    strengths = [0.0, 0.05, 0.1]
    seeds = [1, 2, 3]
    srv = make_server(synth, slots=2, chunk_steps=8, max_text_len=80,
                      retain_sessions=True)
    wavs = srv.run(TEXTS[:3], seeds=seeds, denoiser_strengths=strengths)
    assert srv.stats["denoiser_calls"] > 0

    raw = make_server(synth, slots=2, chunk_steps=8, max_text_len=80,
                      retain_sessions=True).run(TEXTS[:3], seeds=seeds)
    # strength 0 bypasses the denoiser entirely (raw emission path)
    np.testing.assert_array_equal(wavs[0], raw[0])
    hop = synth._denoise_params.hop_length
    for i in (1, 2):
        ref = np.asarray(synth._denoise(
            jnp.asarray(raw[i][None]), strengths[i]))[0]
        assert wavs[i].shape == (hop * (raw[i].shape[0] // hop),)
        np.testing.assert_allclose(wavs[i], ref, atol=2e-6, rtol=2e-5,
                                   err_msg=f"sid {i}")
        # the knob is live (bias actually subtracted)
        assert np.abs(wavs[i] - raw[i][: wavs[i].shape[0]]).max() > 1e-4


def test_server_denoiser_bias_swaps_on_reload(synthesizer):  # noqa: F811
    """load_weights under a running server swaps the denoiser bias too
    (it's a jit ARGUMENT read per call): the same request after the swap
    equals the offline denoiser with the NEW bias over the NEW raw audio,
    and the windowed-denoise program never recompiles."""
    from text2speech_tpu.infer import Synthesizer

    dkw = dict(filter_length=64, n_overlap=4, win_length=64, n_frames=16)
    mk_synth = lambda wv: Synthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=wv, use_denoiser=True, denoiser_kwargs=dkw,
    )
    synth = mk_synth(synthesizer.wg_variables)
    srv = make_server(synth, slots=1, chunk_steps=8, max_text_len=80)
    w1 = srv.run([TEXTS[0]], seeds=[5], denoiser_strengths=[0.1])[0]
    compiles_before = srv._denoiser._jit._cache_size()
    # 0 == 0 after reload would pass trivially under leaked trace state
    from jax._src import core as _jcore
    assert _jcore.trace_state_clean() and compiles_before > 0

    prng = np.random.RandomState(11)
    new_wv = jax.tree.map(
        lambda x: x + (0.02 * prng.randn(*x.shape)).astype(x.dtype),
        synthesizer.wg_variables)
    synth.load_weights(wg_variables=new_wv)

    w2 = srv.run([TEXTS[0]], seeds=[5], denoiser_strengths=[0.1])[1]
    assert not np.array_equal(w1, w2)           # swap is live
    assert srv._denoiser._jit._cache_size() == compiles_before

    # offline reference over the new weights' raw audio with the NEW bias
    ref_synth = mk_synth(new_wv)
    raw = make_server(ref_synth, slots=1, chunk_steps=8,
                      max_text_len=80).run([TEXTS[0]], seeds=[5])[0]
    ref = np.asarray(ref_synth._denoise(jnp.asarray(raw[None]), 0.1))[0]
    np.testing.assert_allclose(w2, ref, atol=2e-6, rtol=2e-5)


def test_server_denoiser_submit_validation(synthesizer):  # noqa: F811
    """Bad strengths raise at submit; strength > 0 on a denoiser-less
    server raises instead of dying inside step()."""
    srv = make_server(synthesizer, slots=1, chunk_steps=8, max_text_len=80)
    for bad in (float("nan"), -0.1, "x", True):
        with pytest.raises(ValueError):
            srv.submit(TEXTS[0], denoiser_strength=bad)
    with pytest.raises(ValueError, match="without a denoiser"):
        srv.submit(TEXTS[0], denoiser_strength=0.1)   # use_denoiser=False
    assert srv.submit(TEXTS[0], denoiser_strength=0.0) == 0  # 0 is fine
    srv.cancel(0)


def test_server_stats_per_session_accounting(synthesizer):  # noqa: F811
    srv = make_server(synthesizer, slots=2, chunk_steps=8, max_text_len=80,
                      retain_sessions=True)
    wavs = srv.run(TEXTS[:3])
    st = srv.stats
    assert st["completed"] == 3
    assert st["emitted_samples"] == sum(w.size for w in wavs.values())
    for sid in wavs:
        s = srv.sessions[sid]
        assert s.emitted_samples == wavs[sid].size
        assert s.first_emit_round is not None
        assert s.first_emit_round >= s.admit_round
    assert st["first_audio_rounds_sum"] >= 0


def _tp_synth(synthesizer, mesh, data_axis):
    from text2speech_tpu.parallel.serve import TPSynthesizer

    return TPSynthesizer(
        hp=synthesizer.hp, taco=synthesizer.taco,
        taco_variables=synthesizer.taco_variables,
        wg_cfg=synthesizer.wg_cfg, waveglow=synthesizer.waveglow,
        wg_variables=synthesizer.wg_variables,
        mesh=mesh, data_axis=data_axis, chunk_steps=8,
    )


def test_server_tp_matches_single_device(synthesizer):  # noqa: F811
    """The mesh-split server (TP decode + TP vocoder) reproduces the
    single-device server per session — per-row keys make the dropout
    streams identical, TP numerics are fp-tolerance equal."""
    from jax.sharding import Mesh
    from text2speech_tpu.server import make_server_tp

    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("model",))
    tps = _tp_synth(synthesizer, mesh, data_axis=None)
    seeds = [7, 8, 9]
    wav_tp = make_server_tp(tps, slots=2, chunk_steps=8, max_text_len=80,
                            sigma=0.8).run(TEXTS[:3], seeds=seeds)
    wav_s = make_server(synthesizer, slots=2, chunk_steps=8,
                        max_text_len=80, sigma=0.8).run(
        TEXTS[:3], seeds=seeds)
    for sid in wav_s:
        assert wav_tp[sid].shape == wav_s[sid].shape, sid
        np.testing.assert_allclose(wav_tp[sid], wav_s[sid], atol=2e-3,
                                   err_msg=f"sid {sid}")


def test_server_tp_per_request_denoiser(synthesizer):  # noqa: F811
    """make_server_tp(use_denoiser=True) serves per-request strengths like
    the single-device server: the denoised TP session equals the offline
    denoiser over the TP raw audio."""
    from jax.sharding import Mesh

    from text2speech_tpu.models.denoiser import make_denoiser
    from text2speech_tpu.server import make_server_tp

    dkw = dict(filter_length=64, n_overlap=4, win_length=64, n_frames=16)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("model",))
    tps = _tp_synth(synthesizer, mesh, data_axis=None)
    mk = lambda: make_server_tp(tps, slots=2, chunk_steps=8,
                                max_text_len=80, sigma=0.8,
                                use_denoiser=True, denoiser_kwargs=dkw)
    seeds = [7, 8]
    wavs = mk().run(TEXTS[:2], seeds=seeds, denoiser_strengths=[0.0, 0.08])
    raw = mk().run(TEXTS[:2], seeds=seeds)
    np.testing.assert_array_equal(wavs[0], raw[0])
    _, denoise = make_denoiser(tps.waveglow, tps.wg_variables, **dkw)
    ref = np.asarray(denoise(jnp.asarray(raw[1][None]), 0.08))[0]
    np.testing.assert_allclose(wavs[1], ref, atol=2e-6, rtol=2e-5)


def test_server_tp_denoiser_configs_coexist(synthesizer):  # noqa: F811
    """A TP server's denoiser and the SAME TPSynthesizer's streaming
    denoiser may use different STFT configs concurrently: biases are
    cached per config (a shared attribute would let the stream path
    clobber the server's bias — different cutoff => broadcast error
    inside step(); r4 code-review finding)."""
    from jax.sharding import Mesh

    from text2speech_tpu.models.denoiser import make_denoiser
    from text2speech_tpu.server import make_server_tp

    dkw_srv = dict(filter_length=64, n_overlap=4, win_length=64, n_frames=16)
    dkw_stream = dict(filter_length=32, n_overlap=4, win_length=32,
                      n_frames=8)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("model",))
    tps = _tp_synth(synthesizer, mesh, data_axis=None)
    srv = make_server_tp(tps, slots=2, chunk_steps=8, max_text_len=80,
                         sigma=0.8, use_denoiser=True,
                         denoiser_kwargs=dkw_srv)
    # a streaming denoise with a DIFFERENT config in between
    stream = np.concatenate(list(tps.synthesize_incremental(
        TEXTS[0], sigma=0.8, seed=3, chunk_steps=8,
        denoiser_strength=0.05, denoiser_kwargs=dkw_stream)))
    assert stream.size > 0 and np.isfinite(stream).all()
    # the server still denoises with ITS config, matching the offline ref
    wavs = srv.run([TEXTS[0]], seeds=[7], denoiser_strengths=[0.05])
    raw = make_server_tp(tps, slots=1, chunk_steps=8, max_text_len=80,
                         sigma=0.8).run([TEXTS[0]], seeds=[7])
    _, denoise = make_denoiser(tps.waveglow, tps.wg_variables, **dkw_srv)
    ref = np.asarray(denoise(jnp.asarray(raw[0][None]), 0.05))[0]
    np.testing.assert_allclose(wavs[0], ref, atol=2e-6, rtol=2e-5)


def test_server_tp_data_model_mesh(synthesizer):  # noqa: F811
    """On a 2-D data x model mesh the per-row step keys are sharded
    P(None, 'data'), so each data shard's rows still draw from their own
    keys — sessions equal the single-device server."""
    from jax.sharding import Mesh
    from text2speech_tpu.server import make_server_tp

    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]).reshape(2, 4),
                ("data", "model"))
    tps = _tp_synth(synthesizer, mesh, data_axis="data")
    seeds = [3, 4]
    wav_tp = make_server_tp(tps, slots=2, chunk_steps=8, max_text_len=80,
                            sigma=0.8).run(TEXTS[:2], seeds=seeds)
    wav_s = make_server(synthesizer, slots=2, chunk_steps=8,
                        max_text_len=80, sigma=0.8).run(
        TEXTS[:2], seeds=seeds)
    for sid in wav_s:
        assert wav_tp[sid].shape == wav_s[sid].shape, sid
        np.testing.assert_allclose(wav_tp[sid], wav_s[sid], atol=2e-3,
                                   err_msg=f"sid {sid}")


# --- toy-driven scheduler test (exact arithmetic, no models) ---------------


def _toy_batcher(slots, stop_at_by_req, cs=4, requested=16):
    """ContinuousBatcher over deterministic toy callables.

    A request is an integer uid; its decode emits mel[c, k] =
    uid*1000 + step + c/10 and its gate fires after ``stop_at_by_req[uid]``
    frames.  Postnet residual is zero; the toy vocoder is local:
    audio[2k:2k+2] = mel[0, k] + noise[k].  prf=1/ov=1 keep the window
    machinery engaged while every value stays exactly reconstructable.
    """
    n_mel, prf, ov, gpf, hop = 2, 1, 1, 1, 2

    def admit_fn(uid, seed):
        return {
            "uid": jnp.asarray(float(uid)),
            "t0": jnp.asarray(0.0),
            "stop": jnp.asarray(float(stop_at_by_req[uid])),
            "done": jnp.asarray(False),
        }

    def init_batch_fn():
        z = jnp.zeros((slots,))
        return {"uid": z, "t0": z, "stop": z + 10_000.0,
                "done": jnp.zeros((slots,), bool)}

    def decode_fn(tree, keys):
        n = keys.shape[0]
        steps = tree["t0"][:, None] + jnp.arange(n)[None, :]      # [B, n]
        mel = (tree["uid"][:, None, None] * 1000.0
               + steps[:, None, :]
               + jnp.arange(n_mel)[None, :, None] / 10.0)
        # active marks frames at-or-before the stop frame, like the model
        active = (steps <= tree["stop"][:, None]) & ~tree["done"][:, None]
        done = tree["done"] | (steps[:, -1] >= tree["stop"])
        new = dict(tree)
        new["t0"] = tree["t0"] + n
        new["done"] = done
        return new, mel, active, done

    def postnet_fn(wins):
        return jnp.zeros_like(wins)

    def vocode_fn(mel, noise, sigma):
        base = jnp.repeat(mel[:, 0, :], hop, axis=-1)
        nz = jnp.repeat(noise[0][..., 0], hop // gpf, axis=-1)
        return base + nz

    def key_fn(seed):
        return np.asarray(
            jax.random.split(jax.random.PRNGKey(seed),
                             -(-requested // cs) * cs))

    def draw_noise_fn(key):
        return (np.asarray(
            jax.random.normal(key, (cs * gpf, 1)), np.float32),)

    return ContinuousBatcher(
        slots=slots, chunk_steps=cs, requested=requested, prf=prf, ov=ov,
        n_mel=n_mel, gpf=gpf, hop=hop, noise_widths=(1,), sigma=1.0,
        admit_fn=admit_fn, init_batch_fn=init_batch_fn, decode_fn=decode_fn,
        postnet_fn=postnet_fn, vocode_fn=vocode_fn, key_fn=key_fn,
        draw_noise_fn=draw_noise_fn, retain_sessions=True,
    )


def _toy_expected(srv, uid, sid):
    """Exact expected audio: mel[0, k] = uid*1000 + k over the true length,
    plus the session's own noise stream."""
    s = srv.sessions[sid]
    tl = min(s.out_len, srv.requested)
    mel0 = uid * 1000.0 + np.arange(tl)
    noise = srv._sess_noise(s, tl)[0][:tl, 0]
    # the scheduler pre-scales noise by the session's sigma (exact)
    sg = np.float32(s.sigma)
    return np.repeat(mel0 + sg * noise, srv.hop // 1)[: tl * srv.hop], tl


def test_toy_server_staggered_gates_and_slot_reuse():
    # uid -> stop frame: uid 0 stops fast, uid 1 runs to the contract,
    # uid 2 queues behind both and must take uid 0's freed slot
    stop = {0: 2, 1: 99, 2: 5}
    srv = _toy_batcher(slots=2, stop_at_by_req=stop)
    sids = {uid: srv.submit(uid) for uid in (0, 1, 2)}

    final_round: dict[int, int] = {}
    parts: dict[int, list] = {sid: [] for sid in sids.values()}
    rounds = 0
    while not srv.idle:
        rounds += 1
        assert rounds < 50, "server did not converge"
        for ev in srv.step():
            if ev.final:
                final_round[ev.sid] = rounds
            elif ev.audio is not None:
                parts[ev.sid].append(ev.audio)

    # fast session finished strictly before the slow one
    assert final_round[sids[0]] < final_round[sids[1]]
    # the queued session started in the freed slot and also finished
    assert srv.sessions[sids[2]].slot == srv.sessions[sids[0]].slot
    assert sids[2] in final_round

    for uid, sid in sids.items():
        audio = np.concatenate(parts[sid])
        want, tl = _toy_expected(srv, uid, sid)
        assert tl == min(stop[uid] + 1, srv.requested)  # post-stop excluded
        np.testing.assert_allclose(audio, want, atol=1e-4,
                                   err_msg=f"uid {uid}")


def test_toy_server_idle_slots_are_harmless():
    """A half-empty server produces the same audio as a full one."""
    stop = {0: 6, 1: 6, 2: 6, 3: 6}
    a = _toy_batcher(slots=4, stop_at_by_req=stop)
    outs_a = a.run([0])
    b = _toy_batcher(slots=4, stop_at_by_req=stop)
    outs_b = b.run([0, 1, 2, 3])
    np.testing.assert_allclose(outs_a[0], outs_b[0], atol=1e-4)


def test_toy_server_cancel():
    """Cancel drops a queued session and frees an active session's slot;
    the freed slot admits the next queued request; no further events are
    emitted for cancelled sessions."""
    stop = {0: 99, 1: 99, 2: 4, 3: 99}
    srv = _toy_batcher(slots=1, stop_at_by_req=stop)
    s0 = srv.submit(0)   # takes the slot
    s1 = srv.submit(1)   # queued
    s2 = srv.submit(2)   # queued
    srv.step()
    assert srv.cancel(s1)          # queued -> dropped
    assert srv.cancel(s0)          # active -> slot freed
    assert not srv.cancel(s1)      # already gone
    seen = set()
    rounds = 0
    while not srv.idle:
        rounds += 1
        assert rounds < 30
        for ev in srv.step():
            seen.add(ev.sid)
    assert seen == {s2}            # only the surviving session emits
    assert srv.stats["cancelled"] == 2
    assert srv.stats["completed"] == 1


def test_toy_server_soak_randomized():
    """Soak: 60 sessions with random stop frames, per-session sigmas and
    random mid-flight cancels through a 4-slot server.  Invariants: no
    events after a cancel; every completed session's audio is EXACTLY the
    toy single-pass result at its own sigma; every session ends in exactly
    one of {completed, cancelled}; accounting balances."""
    rng = np.random.RandomState(0)
    n = 60
    stop = {uid: int(rng.randint(1, 20)) for uid in range(n)}
    srv = _toy_batcher(slots=4, stop_at_by_req=stop)   # requested=16
    sigmas = {uid: float(rng.choice([0.5, 1.0, 2.0])) for uid in range(n)}
    sids = {uid: srv.submit(uid, sigma=sigmas[uid]) for uid in range(n)}

    cancelled: set = set()
    finals: set = set()
    parts: dict = {sid: [] for sid in sids.values()}
    rounds = 0
    while not srv.idle:
        rounds += 1
        assert rounds < 500, "server did not converge"
        if rng.rand() < 0.4:                 # random mid-flight cancel
            victim_sid = sids[int(rng.randint(0, n))]
            if (victim_sid not in finals and victim_sid not in cancelled
                    and srv.cancel(victim_sid)):
                cancelled.add(victim_sid)
        for ev in srv.step():
            assert ev.sid not in cancelled, "event after cancel"
            assert ev.sid not in finals, "event after final"
            if ev.final:
                finals.add(ev.sid)
            elif ev.audio is not None:
                parts[ev.sid].append(ev.audio)

    # every session has exactly one outcome
    assert len(finals) + len(cancelled) == n
    assert srv.stats["completed"] == len(finals)
    assert srv.stats["cancelled"] == len(cancelled)
    assert srv.stats["admitted"] == len(finals) + sum(
        1 for s in cancelled if s in srv.sessions)

    uid_of = {v: k for k, v in sids.items()}
    for sid in finals:
        audio = (np.concatenate(parts[sid]) if parts[sid]
                 else np.zeros((0,), np.float32))
        want, tl = _toy_expected(srv, uid_of[sid], sid)
        assert tl == min(stop[uid_of[sid]] + 1, srv.requested)
        np.testing.assert_allclose(audio, want, atol=1e-4,
                                   err_msg=f"sid {sid}")


def test_toy_server_stats_account_rounds():
    stop = {0: 2, 1: 10}
    srv = _toy_batcher(slots=2, stop_at_by_req=stop)
    srv.run([0, 1])
    st = srv.stats
    assert st["admitted"] == 2
    assert st["row_steps"] == st["rounds"] * 2 * srv.cs
    assert 0 < st["active_row_steps"] <= st["row_steps"]


@pytest.mark.parametrize("masked", [False, True])
def test_server_flush_band_sessions_use_exact_pass(masked):
    """Regression (r3 review): a session that emitted ONE mid-stream
    window and then gate-stops shorter than a full vocoder window must
    flush through the exact-length pass (suffix-sliced) — the server
    mirrors the streaming engine's fix.  Toy decode (controlled lengths)
    through a REAL perturbed WaveGlow (a linear toy vocoder cannot see
    the in-tensor zero-tail leak).

    ``masked=True`` additionally wires ``vocode_masked_fn`` (the
    traced-length exact pass): the band and tiny sessions must produce
    the same audio through ONE fixed-Wv-width program instead of one
    exact-shape compile per distinct length."""
    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.models.chunked import (draw_noise, noise_schedule,
                                                receptive_overlap_frames)
    from text2speech_tpu.models.waveglow import WaveGlow

    WGS = WaveGlowConfig(
        n_mel_channels=8, n_flows=2, n_group=4, n_early_every=4,
        wn_n_layers=2, wn_n_channels=16, upsample_kernel=64,
        upsample_stride=16,
    )
    ov = receptive_overlap_frames(WGS)
    cs, prf, requested = 6, 1, 24
    hop = WGS.upsample_stride
    gpf = hop // WGS.n_group
    n_mel = WGS.n_mel_channels
    assert cs + ov <= 12 < cs + 2 * ov  # stop=12 flushes inside the band

    wg = WaveGlow(WGS)
    variables = jax.jit(wg.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, n_mel, requested)),
        jnp.zeros((1, requested * hop)),
    )
    leaves, treedef = jax.tree.flatten(variables)
    kp = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    variables = jax.tree.unflatten(treedef, [
        l + 0.1 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, kp)
    ])

    def vocode_fn(mel, noise, sigma):
        return wg.apply(variables, mel, None, sigma, noise=noise,
                        method=WaveGlow.infer)

    masked_prog = jax.jit(lambda v, mel, nz, sg, t: wg.apply(
        v, mel, None, sg, noise=nz, length=t, method=WaveGlow.infer))
    masked_calls: list[tuple[int, int]] = []

    def vocode_masked_fn(mel, nz, sg, t):
        masked_calls.append((int(mel.shape[-1]), int(t)))
        return masked_prog(variables, mel, nz, sg, t)

    # toy decode: mel[c, k] = uid + k/10 + c/100; gate at stop_by_uid
    stop_by_uid = {0: 12, 1: 2, 2: 99}   # band / tiny / full-contract

    def admit_fn(uid, seed):
        return {"uid": jnp.asarray(float(uid)), "t0": jnp.asarray(0.0),
                "stop": jnp.asarray(float(stop_by_uid[uid])),
                "done": jnp.asarray(False)}

    def init_batch_fn():
        z = jnp.zeros((2,))
        return {"uid": z, "t0": z, "stop": z + 10_000.0,
                "done": jnp.zeros((2,), bool)}

    def decode_fn(tree, keys):
        n = keys.shape[0]
        steps = tree["t0"][:, None] + jnp.arange(n)[None, :]
        mel = (tree["uid"][:, None, None] + steps[:, None, :] / 10.0
               + jnp.arange(n_mel)[None, :, None] / 100.0)
        active = (steps <= tree["stop"][:, None]) & ~tree["done"][:, None]
        done = tree["done"] | (steps[:, -1] >= tree["stop"])
        new = dict(tree, t0=tree["t0"] + n, done=done)
        return new, mel, active, done

    srv = ContinuousBatcher(
        slots=2, chunk_steps=cs, requested=requested, prf=prf, ov=ov,
        n_mel=n_mel, gpf=gpf, hop=hop,
        noise_widths=tuple(noise_schedule(WGS)), sigma=0.8,
        admit_fn=admit_fn, init_batch_fn=init_batch_fn,
        decode_fn=decode_fn, postnet_fn=lambda w: jnp.zeros_like(w),
        vocode_fn=vocode_fn,
        vocode_masked_fn=vocode_masked_fn if masked else None,
        key_fn=lambda seed: np.asarray(jax.random.split(
            jax.random.PRNGKey(seed), requested)),
        draw_noise_fn=lambda key: tuple(
            np.asarray(c[0]) for c in draw_noise(WGS, key, 1, cs * gpf)),
        retain_sessions=True,
    )
    wavs = srv.run([0, 1, 2])
    if masked:
        # both short sessions (band tl=13, tiny tl=3) rode the SAME
        # fixed-width program — one compile covers every short length
        assert sorted(t for _w, t in masked_calls) == [3, 13], masked_calls
        assert {w for w, _t in masked_calls} == {srv.Wv}, masked_calls
        from tests.conftest import assert_one_program
        assert_one_program(masked_prog, what="the server short-pass program")
    for sid, uid in enumerate(stop_by_uid):
        s = srv.sessions[sid]
        tl = min(s.out_len, requested)
        assert tl == min(stop_by_uid[uid] + 1, requested), (uid, tl)
        mel = s.post_cat()[:, :tl]
        comps = srv._sess_noise(s, tl)
        nz = tuple(jnp.asarray(c[None, : tl * gpf]) for c in comps)
        ref = np.asarray(vocode_fn(jnp.asarray(mel[None]), nz, 0.8))[0]
        assert wavs[sid].shape == ref.shape, (uid, wavs[sid].shape)
        np.testing.assert_allclose(wavs[sid], ref, atol=1e-5,
                                   err_msg=f"uid {uid} (tl={tl})")
    # the band session really took the mid-stream-then-exact route
    assert srv.sessions[0].E == 13 and srv.stats["vocoder_calls"] >= 3


def test_toy_server_first_window_fast_path():
    """All-first vocode rounds (a simultaneous admission wave) run at the
    shrunk Wv1 = cs + ov width; rounds that mix a joining session's first
    window with mid-stream windows stay at Wv (one batched call, no
    splitting); every session's audio is still exact."""
    stop = {0: 7, 1: 99, 2: 99}   # uid 0 frees its slot; uid 2 joins late
    srv = _toy_batcher(slots=2, stop_at_by_req=stop)
    assert srv.Wv1 == srv.cs + srv.ov

    widths: list[int] = []
    inner = srv._vocode_fn

    def recording_vocode(mel, noise, sigma):
        widths.append(int(mel.shape[-1]))
        return inner(mel, noise, sigma)

    srv._vocode_fn = recording_vocode
    sids = {uid: srv.submit(uid) for uid in (0, 1, 2)}

    parts: dict[int, list] = {sid: [] for sid in sids.values()}
    rounds = 0
    while not srv.idle:
        rounds += 1
        assert rounds < 60, "server did not converge"
        for ev in srv.step():
            if not ev.final and ev.audio is not None:
                parts[ev.sid].append(ev.audio)

    # uids 0+1 admit together: their first vocode round is all-firsts
    assert widths[0] == srv.Wv1, widths
    # uid 2 joins a batch where uid 1 is mid-stream: mixed rounds (and all
    # mid-stream rounds) run at the full window width
    assert srv.Wv in widths, widths
    assert set(widths) <= {srv.Wv1, srv.Wv}, widths

    for uid, sid in sids.items():
        audio = np.concatenate(parts[sid])
        want, tl = _toy_expected(srv, uid, sid)
        np.testing.assert_allclose(audio, want, atol=1e-4,
                                   err_msg=f"uid {uid}")


def test_warm_window_widths_compiles_both_programs():
    """warm_window_widths (the pre-bind HTTP warmup's width coverage,
    ADVICE r4) drives the vocode handle once at EACH fixed width — Wv1 and
    Wv — at the full slot batch, so a short warmup text can no longer
    leave the steady-state width cold for the first long real request."""
    srv = _toy_batcher(slots=3, stop_at_by_req={})

    calls: list[tuple[int, int]] = []
    inner = srv._vocode_fn

    def recording_vocode(mel, noise, sigma):
        calls.append((int(mel.shape[0]), int(mel.shape[-1])))
        return inner(mel, noise, sigma)

    srv._vocode_fn = recording_vocode
    srv.warm_window_widths()
    assert calls == [(3, srv.Wv1), (3, srv.Wv)], calls
    # noise shapes must match what _run_vocoder passes at each width
    # (same program signature, or the warm call compiles the WRONG program)
    srv._vocode_fn = inner
    srv.warm_window_widths()  # no error with the real handle either
