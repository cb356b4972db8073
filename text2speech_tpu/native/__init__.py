"""ctypes bindings for the native audio IO library (wavio.cc).

Builds ``libwavio.so`` on first use with g++ (cached next to the source);
every entry point has a pure-Python/scipy fallback so the package works
without a compiler.  ``load_wav_native`` is the drop-in fast path used by
:func:`text2speech_tpu.dsp.audio.load_wav`.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wavio.cc")
_LIB = os.path.join(_DIR, "libwavio.so")


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("bits_per_sample", ctypes.c_int32),
        ("format", ctypes.c_int32),
        ("n_frames", ctypes.c_int64),
        ("data_offset", ctypes.c_int64),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


@functools.cache
def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
    lib.wav_info.restype = ctypes.c_int
    lib.wav_read_f32.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    lib.wav_read_f32.restype = ctypes.c_int64
    lib.resample_poly.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    lib.mulaw_quantize.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
    ]
    lib.peak_rescale.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.c_float,
    ]
    return lib


@functools.lru_cache(maxsize=32)
def _resample_taps(up: int, down: int) -> np.ndarray:
    """Kaiser-windowed FIR taps identical to scipy.signal.resample_poly's
    internal design (firwin, 10*max(up,down) half-width, beta=5.0)."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    return firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0)).astype(np.float64)


def load_wav_native(path: str, sr: int) -> np.ndarray | None:
    """Native decode + polyphase resample; None if the native lib is missing
    or the file can't be parsed (caller falls back to scipy)."""
    lib = get_lib()
    if lib is None:
        return None
    info = _WavInfo()
    if lib.wav_info(path.encode(), ctypes.byref(info)) != 0:
        return None
    out = np.empty(info.n_frames, np.float32)
    n = lib.wav_read_f32(path.encode(), out, info.n_frames)
    if n < 0:
        return None
    y = out[:n]
    if info.sample_rate != sr:
        g = int(np.gcd(int(sr), int(info.sample_rate)))
        up, down = sr // g, info.sample_rate // g
        taps = _resample_taps(up, down)
        n_out = -(-len(y) * up // down)  # ceil
        res = np.empty(n_out, np.float32)
        lib.resample_poly(
            np.ascontiguousarray(y), len(y), up, down, taps, len(taps), res, n_out
        )
        y = res
    return y


def mulaw_quantize_native(x: np.ndarray, mu: int = 256) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(len(x), np.int16)
    lib.mulaw_quantize(x, len(x), mu, out)
    return out
