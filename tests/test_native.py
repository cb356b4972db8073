"""Native (C++) audio IO parity vs scipy: wav decode, polyphase resample,
mu-law quantize."""

import numpy as np
import pytest
from scipy.io import wavfile
from scipy.signal import resample_poly

from text2speech_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _tone(sr=22050, n=22050):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def test_wav_decode_pcm16(lib, tmp_path):
    y = _tone()
    path = str(tmp_path / "t.wav")
    wavfile.write(path, 22050, (y * 32767).astype(np.int16))
    got = native.load_wav_native(path, 22050)
    assert got is not None and len(got) == len(y)
    want = (y * 32767).astype(np.int16).astype(np.float32) / 32768.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_wav_decode_float32_stereo(lib, tmp_path):
    y = _tone(n=4000)
    stereo = np.stack([y, -y], axis=1)
    path = str(tmp_path / "s.wav")
    wavfile.write(path, 22050, stereo)
    got = native.load_wav_native(path, 22050)
    # mono downmix of (y, -y) is 0
    np.testing.assert_allclose(got, np.zeros_like(y), atol=1e-6)


def test_native_resample_matches_scipy(lib, tmp_path):
    y = _tone(sr=44100, n=44100)
    path = str(tmp_path / "r.wav")
    wavfile.write(path, 44100, (y * 32767).astype(np.int16))
    got = native.load_wav_native(path, 22050)
    y16 = (y * 32767).astype(np.int16).astype(np.float32) / 32768.0
    want = resample_poly(y16, 1, 2).astype(np.float32)
    assert got is not None
    n = min(len(got), len(want))
    np.testing.assert_allclose(got[:n], want[:n], atol=1e-4)


def test_native_resample_up(lib, tmp_path):
    # 44100 -> 44800 (the reference hparams rate): up=448/441 -> 448/441
    y = _tone(sr=44100, n=22050)
    path = str(tmp_path / "u.wav")
    wavfile.write(path, 44100, (y * 32767).astype(np.int16))
    got = native.load_wav_native(path, 44800)
    y16 = (y * 32767).astype(np.int16).astype(np.float32) / 32768.0
    g = np.gcd(44800, 44100)
    want = resample_poly(y16, 44800 // g, 44100 // g).astype(np.float32)
    n = min(len(got), len(want))
    np.testing.assert_allclose(got[:n], want[:n], atol=1e-4)


def test_native_mulaw_matches_reference(lib):
    x = np.linspace(-1, 1, 513).astype(np.float32)
    got = native.mulaw_quantize_native(x, 256)
    y = np.sign(x) * np.log1p(255 * np.abs(x)) / np.log1p(255)
    want = ((y + 1) / 2 * 255).astype(int)
    np.testing.assert_array_equal(got, want)


def test_wav_unsupported_formats_reject_and_fall_back(lib, tmp_path):
    """Formats the native decoder has no branch for must FAIL the native
    read (r4 review: float64 previously decoded as n frames of SILENCE
    with a success code) so dsp.audio.load_wav falls back to scipy."""
    from text2speech_tpu.dsp.audio import load_wav

    y = _tone(n=4000).astype(np.float64)
    path = str(tmp_path / "f64.wav")
    wavfile.write(path, 22050, y)               # 64-bit float WAV
    assert native.load_wav_native(path, 22050) is None
    got = load_wav(path, 22050)                 # scipy fallback decodes it
    assert got is not None and np.abs(got).max() > 0.1
    np.testing.assert_allclose(got, y.astype(np.float32), atol=1e-6)


def test_wav_wide_frames_reject_not_overflow(lib, tmp_path):
    """Frames wider than the native read buffer's 8 bytes/frame budget
    (e.g. 6-channel 16-bit) must be rejected, not decoded through a
    buffer overflow (r4 review finding)."""
    y = _tone(n=1000)
    six = np.stack([y] * 6, axis=1)
    path = str(tmp_path / "six.wav")
    wavfile.write(path, 22050, (six * 32767).astype(np.int16))
    assert native.load_wav_native(path, 22050) is None
    # the python chain still loads it through scipy
    from text2speech_tpu.dsp.audio import load_wav

    got = load_wav(path, 22050)
    assert got is not None and len(got) == len(y)
