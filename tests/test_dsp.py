"""DSP parity tests (SURVEY.md §4 items 1-2).

The STFT is checked against the direct numpy rfft definition (which is what
librosa.stft computes); pre-emphasis against scipy.signal.lfilter; the mu-law
family against the reference formulas evaluated in numpy; ISTFT by round-trip.
"""

import os

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from text2speech_tpu.config import HParams
from text2speech_tpu.dsp import (
    MelFrontend,
    STFTParams,
    amp_to_db,
    db_to_amp,
    denormalize_spec,
    griffin_lim,
    hann_window,
    inv_mulaw_quantize,
    inv_preemphasis,
    istft,
    linear_spectrogram,
    mel_and_linear_spectrogram,
    mel_filterbank,
    mel_spectrogram,
    mulaw,
    mulaw_quantize,
    normalize_spec,
    preemphasis,
    stft_mag_phase,
    stft_magnitude,
    trim_silence_bounds,
)

HP = HParams(sample_rate=22050)
PARAMS = STFTParams(1024, 256, 1024)


def _rand_wave(n=8192, seed=0, batch=2):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 22050.0
    base = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1310 * t)
    out = np.stack([base + 0.01 * rng.randn(n) for _ in range(batch)])
    return out.astype(np.float32)


def _numpy_stft_mag(y, n_fft, hop, win):
    """Direct definition: reflect-pad, frame, window, rfft — what librosa.stft
    computes with center=True."""
    w = hann_window(win)
    pad = n_fft // 2
    yp = np.pad(y, pad, mode="reflect")
    n_frames = 1 + (len(yp) - n_fft) // hop
    frames = np.stack([yp[i * hop : i * hop + n_fft] for i in range(n_frames)])
    spec = np.fft.rfft(frames * w[None, :], axis=1)
    return np.abs(spec).T  # [n_freq, n_frames]


def test_stft_matches_rfft_definition():
    y = _rand_wave()
    got = np.asarray(stft_magnitude(jnp.asarray(y), PARAMS))
    for b in range(y.shape[0]):
        want = _numpy_stft_mag(y[b], 1024, 256, 1024)
        assert got[b].shape == want.shape
        np.testing.assert_allclose(got[b], want, atol=2e-3, rtol=1e-4)


def test_stft_frame_count():
    y = jnp.zeros((1, 10240))
    mag = stft_magnitude(y, PARAMS)
    assert mag.shape == (1, 513, 1 + 10240 // 256)


def test_istft_roundtrip():
    y = _rand_wave(n=8192, batch=1)
    mag, phase = stft_mag_phase(jnp.asarray(y), PARAMS)
    rec = np.asarray(istft(mag, phase, PARAMS))
    # center=True STFT + wss-corrected ISTFT reconstructs T = hop*(n_frames-1)
    n = min(rec.shape[1], y.shape[1])
    # edges lose half a window of context; compare the interior
    sl = slice(1024, n - 1024)
    np.testing.assert_allclose(rec[0, sl], y[0, sl], atol=5e-3)


def test_preemphasis_matches_scipy_lfilter():
    y = _rand_wave(batch=1)[0]
    got = np.asarray(preemphasis(jnp.asarray(y[None]), 0.97))[0]
    want = scipy.signal.lfilter([1, -0.97], [1], y)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # inverse undoes it
    back = np.asarray(inv_preemphasis(jnp.asarray(got[None]), 0.97))[0]
    np.testing.assert_allclose(back, y, atol=1e-4)


def test_amp_db_roundtrip():
    x = jnp.asarray([1e-6, 1e-3, 0.5, 1.0, 10.0])
    db = amp_to_db(x, -100)
    # floor at min_level_db
    assert np.asarray(db)[0] == pytest.approx(-100.0, abs=1e-2)
    back = db_to_amp(db)
    np.testing.assert_allclose(np.asarray(back[1:]), np.asarray(x[1:]), rtol=1e-3)


def test_normalize_denormalize_roundtrip():
    hp = HP.replace(signal_normalization=True, allow_clipping_in_normalization=True)
    S = jnp.asarray(np.random.RandomState(0).uniform(-120, 0, (4, 16)))
    N = normalize_spec(S, hp)
    assert float(jnp.max(jnp.abs(N))) <= hp.max_abs_value + 1e-6
    D = denormalize_spec(N, hp)
    inside = (S > -100) & (S < 0)
    np.testing.assert_allclose(
        np.asarray(D)[np.asarray(inside)], np.asarray(S)[np.asarray(inside)], atol=1e-4
    )


def test_mulaw_matches_reference_formulas():
    x = np.linspace(-1, 1, 101).astype(np.float32)
    got = np.asarray(mulaw(jnp.asarray(x), 255))
    want = np.sign(x) * np.log1p(255 * np.abs(x)) / np.log1p(255)
    np.testing.assert_allclose(got, want, atol=1e-4)

    q = np.asarray(mulaw_quantize(jnp.asarray(x), 256))
    want_q = ((np.sign(x) * np.log1p(255 * np.abs(x)) / np.log1p(255) + 1) / 2 * 255
              ).astype(int)
    np.testing.assert_array_equal(q, want_q)
    assert q.min() >= 0 and q.max() <= 255

    back = np.asarray(inv_mulaw_quantize(jnp.asarray(q), 256))
    # companding step near |x|=1 is ~ln(1+mu)*(1+mu)/mu^2 ≈ 0.022
    assert np.abs(back - x).max() < 0.05


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter has one contiguous support region ending below fmax bin
    fmax_bin = int(np.ceil(8000 / (22050 / 2) * 512))
    assert fb[:, fmax_bin + 2 :].sum() == 0
    # Slaney normalization: peak * width ~ 2 (area-normalized triangles)
    assert (fb.sum(axis=1) > 0).all()
    # full-range bank forms ~partition of unity after undoing area norm
    fb_full = mel_filterbank(22050, 1024, 80)  # fmax = sr/2
    assert fb_full[:, -1].sum() >= 0


def test_offline_mel_linear_spectrograms():
    y = _rand_wave(batch=1)
    hp = HP
    mel = np.asarray(mel_spectrogram(jnp.asarray(y), hp))
    lin = np.asarray(linear_spectrogram(jnp.asarray(y), hp))
    assert mel.shape[1] == 80 and lin.shape[1] == 513
    assert mel.shape[2] == lin.shape[2]  # datasets/kss.py:113 invariant
    m2, l2 = mel_and_linear_spectrogram(jnp.asarray(y), hp)
    np.testing.assert_allclose(np.asarray(m2), mel, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), lin, atol=1e-5)
    # dB range sane: <= -ref_level_db floor
    assert lin.max() < 40 and lin.min() >= -100 - hp.ref_level_db - 1e-3


def test_online_mel_frontend():
    y = _rand_wave(batch=2)
    fe = MelFrontend(sampling_rate=22050)
    mel = np.asarray(fe.mel_spectrogram(jnp.asarray(y)))
    assert mel.shape == (2, 80, 1 + y.shape[1] // 256)
    # log-clamp floor
    assert mel.min() >= np.log(1e-5) - 1e-5


def test_trim_silence_bounds():
    sr = 22050
    sig = 0.5 * np.sin(2 * np.pi * 220 * np.arange(sr // 2) / sr).astype(np.float32)
    padded = np.concatenate([np.zeros(4000, np.float32), sig, np.zeros(6000, np.float32)])
    s, e = trim_silence_bounds(padded, top_db=23, frame_length=512, hop_length=128)
    assert s <= 4000 + 256 and s >= 4000 - 512
    assert abs(e - (4000 + len(sig))) <= 512
    # all-silence input
    s0, e0 = trim_silence_bounds(np.zeros(1000, np.float32), 23, 512, 128)
    assert e0 - s0 <= 0 or (e0 - s0) == 1000  # ref=amin -> everything "loud"


def test_griffin_lim_reconstructs_tone():
    sr = 22050
    y = (0.4 * np.sin(2 * np.pi * 440 * np.arange(16384) / sr)).astype(np.float32)[None]
    hp = HP
    lin = linear_spectrogram(jnp.asarray(y), hp)
    S = db_to_amp(lin + hp.ref_level_db) ** hp.power
    rec = np.asarray(griffin_lim(S, hp, jax.random.PRNGKey(0), n_iters=30))
    # spectral peak must be at 440 Hz
    spec = np.abs(np.fft.rfft(rec[0, 2048:10240]))
    peak_hz = np.argmax(spec) * sr / (10240 - 2048)
    assert abs(peak_hz - 440) < 10


def test_device_trim_bounds_match_host():
    """Batched on-device trim (dsp.audio.trim_bounds_batch) == the host
    librosa.effects.trim reimplementation per row, across varied silence
    pads, amplitudes, and an all-silent row (VERDICT r2 item #8)."""
    import jax
    import jax.numpy as jnp

    from text2speech_tpu.config import HParams
    from text2speech_tpu.dsp.audio import trim_bounds_batch, trim_silence_bounds

    hp = HParams()
    rng = np.random.RandomState(0)
    sr = hp.sample_rate
    sigs, host_bounds = [], []
    for i in range(9):
        lead = rng.randint(0, sr // 2)
        tail = rng.randint(0, sr // 2)
        n = rng.randint(sr // 2, sr)
        t = np.arange(n) / sr
        amp = [0.5, 0.05, 0.9][i % 3]
        tone = amp * np.sin(2 * np.pi * (150 + 60 * i) * t)
        y = np.concatenate([
            np.zeros(lead, np.float32),
            tone.astype(np.float32),
            np.zeros(tail, np.float32),
        ])
        sigs.append(y)
        host_bounds.append(
            trim_silence_bounds(y, hp.trim_top_db, hp.trim_fft_size,
                                hp.trim_hop_size)
        )
    sigs.append(np.zeros(sr // 3, np.float32))     # all-silent row
    host_bounds.append(
        trim_silence_bounds(sigs[-1], hp.trim_top_db, hp.trim_fft_size,
                            hp.trim_hop_size)
    )

    T = max(len(y) for y in sigs)
    batch = np.zeros((len(sigs), T), np.float32)
    lens = np.zeros((len(sigs),), np.int32)
    for j, y in enumerate(sigs):
        batch[j, : len(y)] = y
        lens[j] = len(y)
    starts, ends = jax.jit(
        lambda y, n: trim_bounds_batch(
            y, n, hp.trim_top_db, hp.trim_fft_size, hp.trim_hop_size
        )
    )(jnp.asarray(batch), jnp.asarray(lens))
    for j, (hs, he) in enumerate(host_bounds):
        assert int(starts[j]) == hs and int(ends[j]) == he, (
            j, int(starts[j]), int(ends[j]), hs, he
        )


def test_preprocess_device_trim_equals_host_trim(tmp_path):
    """preprocess_corpus(trim_impl='device') writes byte-identical
    audio/mel/linear arrays to the host-trim path (same bounds, same
    host-side reflect pad, same device STFT)."""
    import jax.numpy as jnp  # noqa: F401

    from scipy.io import wavfile

    from text2speech_tpu.config import HParams
    from text2speech_tpu.data.preprocess import preprocess_corpus

    hp = HParams()
    root = tmp_path / "kss"
    (root / "1").mkdir(parents=True)
    rng = np.random.RandomState(1)
    lines = []
    for i in range(4):
        n = hp.sample_rate // 2 + i * 2000
        t = np.arange(n) / hp.sample_rate
        sig = np.concatenate([
            np.zeros(3000, np.float32),
            (0.5 * np.sin(2 * np.pi * (200 + 40 * i) * t)).astype(np.float32)
            + 0.005 * rng.randn(n).astype(np.float32),
            np.zeros(5000, np.float32),
        ])
        wavfile.write(str(root / "1" / f"1_{i:04d}.wav"), hp.sample_rate,
                      (sig * 32767).astype(np.int16))
        lines.append(f"1/1_{i:04d}.wav|안녕|안녕|1.0초")
    (root / "transcript.txt").write_text("\n".join(lines), encoding="utf-8")

    out_d = str(tmp_path / "out_device")
    out_h = str(tmp_path / "out_host")
    meta_d = preprocess_corpus(hp, str(root), out_d, device_batch=2,
                               trim_impl="device")
    meta_h = preprocess_corpus(hp, str(root), out_h, device_batch=2,
                               trim_impl="host")
    assert len(meta_d) == len(meta_h) == 4
    for m in meta_d:
        npz_d = np.load(os.path.join(out_d, m[6]))
        npz_h = np.load(os.path.join(out_h, m[6]))
        np.testing.assert_array_equal(npz_d["audio"], npz_h["audio"])
        np.testing.assert_array_equal(npz_d["mel"], npz_h["mel"])
        np.testing.assert_array_equal(npz_d["linear"], npz_h["linear"])
        assert int(npz_d["time_steps"]) == int(npz_h["time_steps"])


def test_choose_trim_impl_policy():
    """The measured-cost trim placement rule (VERDICT r4 #5): device trim's
    marginal cost is one extra length-bucketed H2D upload; host trim's is
    the numpy trim time.  A real TPU host's multi-GB/s link makes the
    upload ~free (device wins); this rig's ~21 MB/s tunnel makes a 3 s
    utterance's 64 KiB-bucketed upload ~12 ms vs ~2 ms of host numpy
    (host wins — matching BASELINE.md's measured 7,442 host vs 6,853
    device frames/s)."""
    from text2speech_tpu.data.preprocess import choose_trim_impl

    avg = 3.0 * 22050  # ~3 s utterance
    # real TPU host: ~8 GB/s PCIe, host numpy ~30 Msamples/s
    assert choose_trim_impl(8000.0, 30e6, avg) == "device"
    # this rig's tunnel: ~21 MB/s H2D
    assert choose_trim_impl(21.0, 30e6, avg) == "host"
    # slow host CPU flips it back even on a modest link
    assert choose_trim_impl(200.0, 1e6, avg) == "device"


def test_preprocess_auto_trim_matches_explicit(tmp_path):
    """trim_impl='auto' (the CLI default) probes, picks one placement, and
    writes byte-identical arrays to explicitly requesting that placement
    (both placements are already pinned equal above, so auto == both)."""
    from scipy.io import wavfile

    from text2speech_tpu.data.preprocess import (
        choose_trim_impl,
        preprocess_corpus,
        probe_trim_costs,
    )

    hp = HParams()
    root = tmp_path / "kss"
    (root / "1").mkdir(parents=True)
    rng = np.random.RandomState(3)
    lines = []
    for i in range(3):
        n = hp.sample_rate // 2 + i * 1500
        t = np.arange(n) / hp.sample_rate
        sig = np.concatenate([
            np.zeros(2500, np.float32),
            (0.5 * np.sin(2 * np.pi * (180 + 30 * i) * t)).astype(np.float32)
            + 0.005 * rng.randn(n).astype(np.float32),
            np.zeros(4000, np.float32),
        ])
        wavfile.write(str(root / "1" / f"1_{i:04d}.wav"), hp.sample_rate,
                      (sig * 32767).astype(np.int16))
        lines.append(f"1/1_{i:04d}.wav|안녕|안녕|1.0초")
    (root / "transcript.txt").write_text("\n".join(lines), encoding="utf-8")

    out_a = str(tmp_path / "out_auto")
    out_e = str(tmp_path / "out_explicit")
    meta_a = preprocess_corpus(hp, str(root), out_a, device_batch=2,
                               trim_impl="auto")
    # reproduce auto's decision (probe is cached per process -> same answer)
    h2d, host_sps = probe_trim_costs(hp)
    avg = float(np.mean([int(m[3]) for m in meta_a]))
    picked = choose_trim_impl(h2d, host_sps, avg)
    meta_e = preprocess_corpus(hp, str(root), out_e, device_batch=2,
                               trim_impl=picked)
    assert len(meta_a) == len(meta_e) == 3
    for m in meta_a:
        npz_a = np.load(os.path.join(out_a, m[6]))
        npz_e = np.load(os.path.join(out_e, m[6]))
        np.testing.assert_array_equal(npz_a["audio"], npz_e["audio"])
        np.testing.assert_array_equal(npz_a["mel"], npz_e["mel"])
