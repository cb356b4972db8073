"""Full-chain TP serving (parallel/serve.py TPSynthesizer): text -> mel ->
waveform over one mesh must reproduce the single-device Synthesizer (same
seeds, fp32) — the decode chunking is the same carry/key discipline as
``text_to_mel_stream`` and the vocoder noise convention matches
``WaveGlow.infer``'s internal draws.  int8 serving stays in the quantized
error band end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from text2speech_tpu.infer import Synthesizer
from text2speech_tpu.models.tacotron2 import Tacotron2
from text2speech_tpu.models.waveglow import WaveGlow
from text2speech_tpu.parallel.serve import TPSynthesizer
from text2speech_tpu.text import N_SYMBOLS
from tests.test_synthesizer import HP, WG

TEXTS = ["안녕하세요.", "존경하는 사람"]


@pytest.fixture(scope="module")
def models():
    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(HP, n_vocab=N_SYMBOLS)
    tvars = taco.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, HP.n_mel_channels, 8)), jnp.asarray([8]),
    )
    wg = WaveGlow(WG)
    wvars = wg.init(
        rng,
        jnp.zeros((1, WG.n_mel_channels, 16)),
        jnp.zeros((1, 16 * WG.upsample_stride)),
    )
    prng = np.random.RandomState(1)
    wparams = jax.tree.map(
        lambda x: x + 0.01 * prng.randn(*x.shape).astype(np.float32),
        wvars["params"],
    )
    return taco, tvars, wg, {"params": wparams}


@pytest.fixture(scope="module")
def single(models):
    taco, tvars, wg, wvars = models
    return Synthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        use_denoiser=False,
    )


@pytest.fixture(scope="module")
def tp(models):
    taco, tvars, wg, wvars = models
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("model",))
    return TPSynthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        mesh=mesh, data_axis=None, chunk_steps=8,
    )


def test_tp_text_to_mel_matches_single_device(single, tp):
    mel_s, len_s = single.text_to_mel(TEXTS, seed=0)
    mel_t, len_t = tp.text_to_mel(TEXTS, seed=0)
    np.testing.assert_array_equal(np.asarray(len_t), np.asarray(len_s))
    for i in range(len(TEXTS)):
        n = int(np.asarray(len_s)[i])
        np.testing.assert_allclose(
            np.asarray(mel_t)[i, :, :n], np.asarray(mel_s)[i, :, :n],
            atol=2e-4,
        )


def test_tp_synthesize_matches_single_device(single, tp):
    wav_s = single.synthesize(TEXTS, sigma=0.8, seed=0)
    wav_t = tp.synthesize(TEXTS, sigma=0.8, seed=0)
    assert len(wav_t) == len(wav_s)
    for a, b in zip(wav_t, wav_s):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_tp_synthesize_int8_tracks_fp(models, tp, monkeypatch):
    # keep the int8 DECODER engaged at this tiny batch (the measured-
    # benefit policy would otherwise serve bf16 decode below the crossover)
    monkeypatch.setattr(
        "text2speech_tpu.models.tacotron_serve.INT8_DECODE_MIN_BATCH", 1)
    taco, tvars, wg, wvars = models
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("model",))
    tp_q = TPSynthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        mesh=mesh, data_axis=None, chunk_steps=8, int8=True,
    )
    wav_fp = tp.synthesize(TEXTS, sigma=0.8, seed=0)
    wav_q = tp_q.synthesize(TEXTS, sigma=0.8, seed=0)
    for a, b in zip(wav_q, wav_fp):
        assert np.isfinite(a).all()
        # int8 decoder drift moves the gate decisions a little; compare on
        # the shared prefix at a coarse band
        n = min(len(a), len(b))
        if n == 0:
            continue
        denom = np.abs(b[:n]).mean() + 1e-6
        assert np.abs(a[:n] - b[:n]).mean() / denom < 0.5


def _biased_gate(tvars, bump: float = 10.0):
    """Copy of the variables with the stop gate biased to fire at step ~1 —
    forces the early-exit / masked-tail regime the untrained default
    fixture never reaches (r3 code-review finding)."""
    tv = jax.tree.map(lambda x: x, tvars)
    tv["params"]["decoder"]["gate_proj"]["bias"] = (
        tv["params"]["decoder"]["gate_proj"]["bias"] + bump
    )
    return tv


def test_tp_early_gate_exit_matches_single_device(models):
    """With every gate firing early: the TP path must early-exit, decode
    the postnet-context tail, zero-mask past each stop, and still equal
    the batch path (which scans ALL requested steps and mask_outputs's
    the result) element-for-element."""
    taco, tvars, wg, wvars = models
    tv = _biased_gate(tvars)
    single = Synthesizer(
        hp=HP, taco=taco, taco_variables=tv,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        use_denoiser=False,
    )
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("model",))
    tp_b = TPSynthesizer(
        hp=HP, taco=taco, taco_variables=tv,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        mesh=mesh, data_axis=None, chunk_steps=8,
    )
    mel_s, len_s = single.text_to_mel(TEXTS, seed=0)
    mel_t, len_t = tp_b.text_to_mel(TEXTS, seed=0)
    # the regime is actually exercised: stops well before max_decoder_steps
    assert (np.asarray(len_s) < HP.max_decoder_steps).all(), np.asarray(len_s)
    np.testing.assert_array_equal(np.asarray(len_t), np.asarray(len_s))
    assert mel_t.shape == mel_s.shape      # padded to requested frames
    np.testing.assert_allclose(
        np.asarray(mel_t), np.asarray(mel_s), atol=2e-4
    )

    wav_s = single.synthesize(TEXTS, sigma=0.8, seed=0)
    wav_t = tp_b.synthesize(TEXTS, sigma=0.8, seed=0)
    for a, b in zip(wav_t, wav_s):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_tp_synthesizer_data_model_mesh(models):
    """2x4 data x model mesh: rows decode independently, and the always-on
    prenet dropout draws over the LOCAL batch shape — so each data shard's
    mel equals a single-device run over THAT shard (see tp_tacotron's
    module docstring), not the row-slice of a full-batch run."""
    taco, tvars, wg, wvars = models
    single = Synthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        use_denoiser=False,
    )
    devices = np.asarray(jax.devices("cpu")[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "model"))
    tp_dm = TPSynthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        mesh=mesh, data_axis="data", chunk_steps=8,
    )
    mel_t, len_t = tp_dm.text_to_mel(TEXTS, seed=0)

    for i, text in enumerate(TEXTS):
        mel_s, len_s = single.text_to_mel([text], seed=0)
        assert int(np.asarray(len_t)[i]) == int(np.asarray(len_s)[0])
        n = int(np.asarray(len_s)[0])
        np.testing.assert_allclose(
            np.asarray(mel_t)[i, :, :n], np.asarray(mel_s)[0, :, :n],
            atol=2e-4,
        )

    wavs = tp_dm.synthesize(TEXTS, sigma=0.8, seed=0)
    assert len(wavs) == len(TEXTS)
    for w in wavs:
        assert np.isfinite(w).all()


def test_tp_synthesize_incremental_matches_single_device(models, tp):
    """TP streaming synthesis (chunked TP decode -> windowed TP vocode over
    position-consistent noise) == single-device synthesize_incremental with
    the same seeds — the first-audio-latency configuration both TP stages
    exist for."""
    taco, tvars, wg, wvars = models
    single = Synthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        use_denoiser=False,
    )
    text = TEXTS[0]
    ref = np.concatenate(list(single.synthesize_incremental(
        text, sigma=0.8, seed=0, chunk_steps=8
    )))
    got_chunks = list(tp.synthesize_incremental(
        text, sigma=0.8, seed=0, chunk_steps=8
    ))
    got = np.concatenate(got_chunks)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)
    assert len(got_chunks) >= 1


def test_tp_synthesize_incremental_denoised(models, tp):
    """TP streaming synthesis with a denoiser strength == the offline
    denoiser over the TP raw stream (the -d knob through the mesh-split
    first-audio path)."""
    import jax.numpy as jnp

    from text2speech_tpu.models.denoiser import make_denoiser

    taco, tvars, wg, wvars = models
    dkw = dict(filter_length=64, n_overlap=4, win_length=64, n_frames=16)
    kw = dict(sigma=0.8, seed=0, chunk_steps=8)
    raw = np.concatenate(list(tp.synthesize_incremental(TEXTS[0], **kw)))
    den = np.concatenate(list(tp.synthesize_incremental(
        TEXTS[0], denoiser_strength=0.07, denoiser_kwargs=dkw, **kw)))
    _, denoise = make_denoiser(wg, wvars, **dkw)
    ref = np.asarray(denoise(jnp.asarray(raw[None]), 0.07))[0]
    assert den.shape == ref.shape
    np.testing.assert_allclose(den, ref, atol=2e-6, rtol=2e-5)


def test_tp_synthesize_incremental_batch_matches_single_device(models, tp):
    """N concurrent TP streams == the single-device batched streaming
    engine row for row (same seeds -> same lockstep decode, same batch
    noise draws; both stages mesh-split on the TP side)."""
    taco, tvars, wg, wvars = models
    single = Synthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        use_denoiser=False,
    )
    kw = dict(sigma=0.8, seed=0, chunk_steps=8)
    ref_rows = {r: [] for r in range(len(TEXTS))}
    for r, ch in single.synthesize_incremental_batch(TEXTS, **kw):
        ref_rows[r].append(ch)
    got_rows = {r: [] for r in range(len(TEXTS))}
    for r, ch in tp.synthesize_incremental_batch(TEXTS, **kw):
        got_rows[r].append(ch)
    for r in range(len(TEXTS)):
        ref = np.concatenate(ref_rows[r])
        got = np.concatenate(got_rows[r])
        assert got.shape == ref.shape, (r, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=2e-3, err_msg=f"row {r}")


def test_tp_default_data_axis_on_model_only_mesh(models, tp):
    """The DEFAULT data_axis="data" must work on a mesh without a data
    axis (normalized to None like the sub-endpoints do) — previously the
    first synthesis call raised KeyError in _endpoints
    (r3 code-review, 2nd pass)."""
    taco, tvars, wg, wvars = models
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("model",))
    tps = TPSynthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        mesh=mesh, chunk_steps=8,          # data_axis left at default
    )
    assert tps.data_axis is None
    got = tps.synthesize([TEXTS[0]], sigma=0.8, seed=0)
    ref = tp.synthesize([TEXTS[0]], sigma=0.8, seed=0)
    np.testing.assert_allclose(got[0], ref[0], atol=1e-5)


def test_tp_bf16_compute_dtype_runs(models):
    """compute_dtype=bfloat16 — the tuned real-TPU serving configuration —
    must be reachable through the full TP chain (previously hardcoded
    fp32); sanity: finite audio of gate-or-contract length."""
    taco, tvars, wg, wvars = models
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("model",))
    tps = TPSynthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        mesh=mesh, data_axis=None, chunk_steps=8,
        compute_dtype=jnp.bfloat16,
    )
    wavs = tps.synthesize([TEXTS[0]], sigma=0.8, seed=0)
    assert len(wavs) == 1 and wavs[0].size > 0
    assert np.isfinite(wavs[0]).all()


def test_tp_batch_short_rows_on_data_model_mesh(models):
    """Early-gate rows shorter than one vocoder window take the engine's
    BATCH-1 vocode_exact path, which a data-sharded vocoder can't split —
    the synthesizer must route those calls to the model-only endpoint
    (r3 code-review, 2nd pass); rows equal the single-device batch
    engine."""
    taco, tvars, wg, wvars = models
    tv = _biased_gate(tvars)
    single = Synthesizer(
        hp=HP, taco=taco, taco_variables=tv,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        use_denoiser=False,
    )
    tps = TPSynthesizer(
        hp=HP, taco=taco, taco_variables=tv,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        mesh=Mesh(
            np.asarray(jax.devices("cpu")[:8]).reshape(2, 4),
            ("data", "model"),
        ),
        data_axis="data", chunk_steps=8,
    )
    kw = dict(sigma=0.8, seed=0, chunk_steps=8)
    texts = TEXTS[:2]                       # B=2 divides the data axis
    ref_rows = {r: [] for r in range(len(texts))}
    for r, ch in single.synthesize_incremental_batch(texts, **kw):
        ref_rows[r].append(ch)
    got_rows = {r: [] for r in range(len(texts))}
    for r, ch in tps.synthesize_incremental_batch(texts, **kw):
        got_rows[r].append(ch)
    for r in range(len(texts)):
        ref = np.concatenate(ref_rows[r])
        got = np.concatenate(got_rows[r])
        # short utterance: must have hit the exact-length (batch-1) path
        from text2speech_tpu.models.chunked import receptive_overlap_frames
        ov = receptive_overlap_frames(WG)
        assert ref.size <= (8 + 2 * ov) * WG.upsample_stride
        assert got.shape == ref.shape, (r, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=2e-3, err_msg=f"row {r}")


def test_tp_incremental_on_data_model_mesh_falls_back(models):
    """B=1 streaming on a 2x4 data x model mesh: the data axis can't split
    a single row, so the synthesizer must fall back to lazily built
    model-only endpoints instead of crashing in device_put
    (r3 code-review); output equals the model-only-mesh stream."""
    taco, tvars, wg, wvars = models
    mk = lambda shape, axes: TPSynthesizer(
        hp=HP, taco=taco, taco_variables=tvars,
        wg_cfg=WG, waveglow=wg, wg_variables=wvars,
        mesh=Mesh(
            np.asarray(
                jax.devices("cpu")[: int(np.prod(shape))]
            ).reshape(shape),
            axes,
        ),
        data_axis="data" if "data" in axes else None, chunk_steps=8,
    )
    tp_dm = mk((2, 4), ("data", "model"))
    tp_m = mk((4,), ("model",))

    got = np.concatenate(list(tp_dm.synthesize_incremental(
        TEXTS[0], sigma=0.8, seed=0, chunk_steps=8
    )))
    ref = np.concatenate(list(tp_m.synthesize_incremental(
        TEXTS[0], sigma=0.8, seed=0, chunk_steps=8
    )))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)
