"""Streaming (windowed) denoiser — the serving-chain form of the reference's
bias-subtraction denoiser (``/root/reference/waveglow/denoiser.py:35-40``).

Contract pinned here: the windowed program (``models.denoiser.
denoise_windows`` driven by ``StreamingDenoiser``'s plan) emits samples
equal to the offline full-signal denoise (``make_denoiser``'s math:
centered STFT -> bias subtraction in magnitude -> ISTFT), for any chunking
of the input — including single-shot (flush-only), uniform, and ragged
feeds, and signal lengths on/off the hop grid.  The STFT/ISTFT pair is
frame-local, so windows carrying every frame that covers the emitted range
reproduce the full computation frame-identically; tolerance is ~1-2 ulp
(XLA selects different matmul kernels for different batch geometries), not
bitwise.  See the derivation in ``models/denoiser.py``.
"""

import numpy as np

import jax.numpy as jnp

from text2speech_tpu.dsp.stft import STFTParams, istft, stft_mag_phase
from text2speech_tpu.models.denoiser import DenoiseBuffer, StreamingDenoiser

PARAMS = STFTParams(64, 16, 64)          # scaled-down reference config


def _offline(audio: np.ndarray, bias: np.ndarray, strength: float):
    """The CLI denoise body (make_denoiser's jitted fn, arbitrary bias)."""
    mag, phase = stft_mag_phase(jnp.asarray(audio[None]), PARAMS)
    mag = jnp.maximum(mag - jnp.asarray(bias) * strength, 0.0)
    return np.asarray(istft(mag, phase, PARAMS))[0]


def _stream(audio: np.ndarray, bias: np.ndarray, strength: float,
            feed, f_win: int = 9) -> np.ndarray:
    """Drive the planner exactly the way ``server._run_denoise`` does
    (DenoiseBuffer incl. its prefix trimming), feeding ``audio`` in
    ``feed``-sized chunks; a decoy second row with different
    content/strength shares every device call (row independence)."""
    den = StreamingDenoiser(lambda: bias, PARAMS, f_win=f_win)
    hop, pad = PARAMS.hop_length, den.pad
    buf = DenoiseBuffer(den)
    out, emitted, pos = [], 0, 0
    for n in feed:
        buf.append(audio[pos : pos + n])
        pos += n
        flushed = pos >= len(audio)
        for f0, nv, e0, e1 in den.plan(buf.total, emitted, flushed):
            win = buf.window(f0, nv, flushed)
            x = np.zeros((2, den.l_pad), np.float32)
            corr = np.ones((2, den.l_pad), np.float32)
            den.fill_row(x[0], corr[0], win, nv)
            den.fill_row(x[1], corr[1], win[::-1].copy(), nv)   # decoy
            o = den(x, np.asarray([strength, 0.77], np.float32),
                    np.asarray([nv, nv], np.int32), corr)
            out.append(o[0, e0 + pad - f0 * hop : e1 + pad - f0 * hop])
            emitted = e1
            buf.trim(emitted)
    assert pos == len(audio)
    return (np.concatenate(out) if out else np.zeros((0,), np.float32))


def _case(T: int, feed, strength: float = 0.2, f_win: int = 9):
    rng = np.random.RandomState(T + len(list(feed)))
    audio = rng.randn(T).astype(np.float32)
    bias = (0.1 * np.abs(rng.randn(1, PARAMS.cutoff, 1))).astype(np.float32)
    ref = _offline(audio, bias, strength)
    got = _stream(audio, bias, strength, feed, f_win=f_win)
    assert got.shape == ref.shape, (T, feed, got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=2e-5,
                               err_msg=f"T={T} feed={feed}")


def test_single_shot_flush():
    """Everything arrives at once: flush-only windows, incl. a signal
    longer than one window (multi-window flush)."""
    _case(320, [320])
    _case(1000, [1000], f_win=9)       # 1000 samples ≈ 59 frames >> f_win


def test_uniform_chunks():
    _case(320, [128, 128, 64])
    _case(512, [128] * 4)


def test_long_stream_trims_emitted_prefix():
    """A long stream stays exact across DenoiseBuffer's prefix trimming
    (the buffer must drop emitted samples — O(S) total host work — while
    every window still reads its full margin)."""
    _case(4000, [250] * 16)
    _case(4000, [4000])          # flush-only long signal: trims mid-plan


def test_ragged_chunks_off_grid_length():
    """Length not a multiple of hop: the denoised stream ends at
    hop*(T//hop), the offline output length."""
    _case(333, [50, 7, 200, 76])
    _case(97, [96, 1])


def test_short_signal_flush_band():
    """Signals shorter than one window flush through a single exact-edge
    window (both reflect edges in one program)."""
    _case(96, [96])
    _case(80, [48, 32])


def test_strength_zero_is_identity_reconstruction():
    """strength=0 reproduces the STFT->ISTFT round trip (not the raw
    input — the reference denoiser also returns the resynthesis)."""
    rng = np.random.RandomState(7)
    audio = rng.randn(320).astype(np.float32)
    bias = np.abs(rng.randn(1, PARAMS.cutoff, 1)).astype(np.float32)
    got = _stream(audio, bias, 0.0, [160, 160])
    ref = _offline(audio, bias, 0.0)
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=2e-5)
    np.testing.assert_allclose(got, audio[: got.shape[0]], atol=2e-5)


def test_plan_covers_exactly_once():
    """Window plans partition the emitted range with no gaps/overlaps and
    never read past the buffered samples mid-stream."""
    den = StreamingDenoiser(lambda: None, PARAMS, f_win=9)
    hop, pad, n_fft = PARAMS.hop_length, den.pad, PARAMS.filter_length
    emitted = 0
    a = 0
    for add, flushed in [(100, False), (37, False), (512, False),
                         (200, True)]:
        a += add
        for f0, nv, e0, e1 in den.plan(a, emitted, flushed):
            assert e0 == emitted and e1 > e0
            # emitted samples' covering frames live inside the window
            assert (e0 + pad) // hop >= f0 >= 0
            assert (e1 - 1 + pad - n_fft) // hop + 1 <= f0 + nv - 1 + 1
            if not flushed:   # no frame reads past the buffered extent
                assert (f0 + nv - 1) * hop + n_fft <= a + pad
            emitted = e1
        assert emitted == den.emit_bound(a, flushed)
    assert emitted == hop * (a // hop)


def test_synthesize_incremental_denoised():
    """Synthesizer.synthesize_incremental(denoiser_strength=s) streams
    audio equal to the offline CLI denoiser over the raw incremental
    stream (the reference applies -d to the finished waveform; here the
    same output streams with < n_fft extra latency)."""
    import pytest

    from text2speech_tpu.infer import Synthesizer
    from tests.test_synthesizer import synthesizer  # noqa: F401

    fixture = synthesizer.__wrapped__()
    dkw = dict(filter_length=64, n_overlap=4, win_length=64, n_frames=16)
    synth = Synthesizer(
        hp=fixture.hp, taco=fixture.taco,
        taco_variables=fixture.taco_variables,
        wg_cfg=fixture.wg_cfg, waveglow=fixture.waveglow,
        wg_variables=fixture.wg_variables,
        use_denoiser=True, denoiser_kwargs=dkw,
    )
    kw = dict(sigma=0.8, seed=3, chunk_steps=8)
    raw = np.concatenate(list(synth.synthesize_incremental("안녕하세요.", **kw)))
    den = np.concatenate(list(synth.synthesize_incremental(
        "안녕하세요.", denoiser_strength=0.07, **kw)))
    ref = np.asarray(synth._denoise(jnp.asarray(raw[None]), 0.07))[0]
    assert den.shape == ref.shape
    np.testing.assert_allclose(den, ref, atol=2e-6, rtol=2e-5)
    assert np.abs(den - raw[: den.shape[0]]).max() > 1e-4   # knob is live

    no_den = Synthesizer(
        hp=fixture.hp, taco=fixture.taco,
        taco_variables=fixture.taco_variables,
        wg_cfg=fixture.wg_cfg, waveglow=fixture.waveglow,
        wg_variables=fixture.wg_variables, use_denoiser=False,
    )
    with pytest.raises(ValueError, match="use_denoiser"):
        next(iter(no_den.synthesize_incremental(
            "안녕.", denoiser_strength=0.1, **{k: v for k, v in kw.items()
                                             if k != "seed"})))
