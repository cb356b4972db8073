"""WaveGlow bias-spectrum denoiser (``/root/reference/waveglow/denoiser.py``).

The vocoder's model bias is estimated once by synthesizing from an all-zero
mel at sigma=0; at synthesis time ``strength * bias_spec`` is subtracted in
the STFT magnitude domain and the signal re-synthesized with the original
phases.  Pure-functional: ``make_denoiser`` returns (bias_spec, denoise_fn).

:func:`denoise_windows` is the STREAMING form used by the continuous-batching
server (``server.py``): one fixed-shape batched program that denoises a
window of each session's audio such that the emitted interior samples equal
the full-utterance ``denoise`` output (the reference applies the denoiser to
whole utterances, ``/root/reference/inference.py:75`` — here the same math is
windowed so audio can stream).  Exactness argument: the STFT/ISTFT pair is
frame-local (each output sample depends only on the <=n_overlap frames
covering it, each frame on ``filter_length`` input samples), so a window that
(a) starts at a multiple of ``hop_length`` of the full signal, (b) carries
the frames covering the emitted range plus ``filter_length`` of margin
frames, and (c) reproduces the reflect padding at true signal edges
host-side, yields frame-identical math; the masked overlap-add and the
host-supplied window-sumsquare correction then reproduce the full-signal
ISTFT at every emitted position (to ~1-2 ulp — XLA selects different
matmul kernels for different batch geometries, so not bitwise;
``tests/test_denoiser_stream.py`` pins 2e-6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.filters import window_sumsquare
from ..dsp.stft import (STFTParams, _forward_basis, _inverse_basis,
                        frame_signal, istft, stft_mag_phase)
from .waveglow import WaveGlow


def denoiser_stft_params(filter_length: int = 1024, n_overlap: int = 4,
                         win_length: int = 1024, **_ignored) -> STFTParams:
    """The STFT configuration :func:`make_denoiser` builds for the given
    kwargs (defaults = the reference's, ``denoiser.py:14-17``); the single
    source of truth shared with the serving-chain :class:`StreamingDenoiser`
    so the streamed output equals the offline path."""
    return STFTParams(filter_length, filter_length // n_overlap, win_length)


DEFAULT_STFT_PARAMS = denoiser_stft_params()


def make_denoiser_programs(
    model: WaveGlow,
    filter_length: int = 1024,
    n_overlap: int = 4,
    win_length: int = 1024,
    mode: str = "zeros",
    n_frames: int = 88,
):
    """Build the denoiser's jitted programs ONCE, independent of any
    checkpoint: ``(compute_bias(variables) -> bias_spec,
    denoise(audio, bias, strength) -> denoised, params)``.

    ``Synthesizer`` caches this pair so a live checkpoint swap
    (``load_weights`` under ``POST /reload``, which runs ON the
    scheduler thread) costs one execution of ``compute_bias`` — zero
    retraces, zero compiles.  :func:`make_denoiser` composes them into
    the one-shot convenience API."""
    params = denoiser_stft_params(filter_length, n_overlap, win_length)
    if mode == "zeros":
        mel = jnp.zeros((1, model.cfg.n_mel_channels, n_frames))
    elif mode == "normal":
        mel = jax.random.normal(
            jax.random.PRNGKey(0), (1, model.cfg.n_mel_channels, n_frames)
        )
    else:
        raise ValueError(f"unsupported denoiser mode {mode!r}")

    @jax.jit
    def compute_bias(variables: dict, m: jnp.ndarray) -> jnp.ndarray:
        bias_audio = model.apply(
            variables, m, jax.random.PRNGKey(0), 0.0, method=WaveGlow.infer)
        bias_spec, _ = stft_mag_phase(bias_audio, params)
        return bias_spec[:, :, 0:1]     # first frame, like denoiser.py:33

    @jax.jit
    def denoise(audio: jnp.ndarray, bias_spec: jnp.ndarray,
                strength) -> jnp.ndarray:
        """audio [B, T] -> denoised [B, T'] (T' loses the STFT center pad)."""
        mag, phase = stft_mag_phase(audio, params)
        mag = jnp.maximum(mag - bias_spec * strength, 0.0)
        return istft(mag, phase, params)

    return (lambda variables: compute_bias(variables, mel)), denoise, params


def make_denoiser(
    model: WaveGlow,
    variables: dict,
    filter_length: int = 1024,
    n_overlap: int = 4,
    win_length: int = 1024,
    mode: str = "zeros",
    n_frames: int = 88,
):
    compute_bias, denoise2, _ = make_denoiser_programs(
        model, filter_length, n_overlap, win_length, mode, n_frames)
    bias_spec = compute_bias(variables)

    def denoise(audio: jnp.ndarray, strength: float = 0.1) -> jnp.ndarray:
        return denoise2(audio, bias_spec, strength)

    return bias_spec, denoise


# ---------------------------------------------------------------------------
# Streaming (windowed) denoiser — the serving-chain form.
# ---------------------------------------------------------------------------


def denoise_windows(
    x_pad: jnp.ndarray,        # [B, L_pad] — window of the reflect-PADDED
                               # full signal starting at a frame boundary,
                               # zero-filled past its valid extent
    bias_spec: jnp.ndarray,    # [1, cutoff, 1]
    strengths: jnp.ndarray,    # [B] per-row denoiser strength (traced —
                               # mixed strengths batch into ONE call)
    n_valid: jnp.ndarray,      # [B] int32 count of REAL frames in the window
    correction: jnp.ndarray,   # [B, L_pad] host-computed 1/window_sumsquare
                               # for the row's n_valid (edge decay included)
    params: STFTParams,
) -> jnp.ndarray:
    """Fixed-shape batched windowed denoise: returns the ISTFT overlap-add of
    the denoised frames over window-local positions [0, L_pad).

    Frames ``i >= n_valid[b]`` are masked to exact zeros (they straddle or
    live in the zero fill and do not exist in the full-signal computation);
    the host's ``correction`` row is ``window_sumsquare`` over exactly the
    ``n_valid`` real frames, so every sample whose covering frames are all
    real reproduces the full-signal ISTFT (frame-identical math; ~1-2 ulp
    from XLA kernel selection).  The caller slices out the emitted range; see
    ``server.ContinuousBatcher`` for the window/margin bookkeeping."""
    n_fft, hop = params.filter_length, params.hop_length
    assert n_fft % hop == 0, "vectorized overlap-add needs hop | n_fft"
    B, L_pad = x_pad.shape
    assert (L_pad - n_fft) % hop == 0
    F = 1 + (L_pad - n_fft) // hop

    basis = jnp.asarray(_forward_basis(n_fft, params.win_length))
    frames = frame_signal(x_pad, n_fft, hop, center=False)      # [B, F, n_fft]
    spec = jnp.einsum("btn,nk->bkt", frames, basis,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    cutoff = params.cutoff
    re, im = spec[:, :cutoff, :], spec[:, cutoff:, :]
    mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)
    mag = jnp.maximum(mag - bias_spec * strengths[:, None, None], 0.0)

    re_im = jnp.concatenate(
        [mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=1)
    inv_basis = jnp.asarray(_inverse_basis(n_fft, params.win_length, hop))
    out_frames = jnp.einsum("bkt,kn->btn", re_im, inv_basis,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    mask = (jnp.arange(F)[None, :] < n_valid[:, None]).astype(out_frames.dtype)
    out_frames = out_frames * mask[:, :, None]

    # same vectorized overlap-add as dsp.stft.istft (hop | n_fft)
    r = n_fft // hop
    chunks = out_frames.reshape(B, F, r, hop)
    signal = jnp.zeros((B, F + r - 1, hop), out_frames.dtype)
    for j in range(r):
        signal = signal.at[:, j : j + F].add(chunks[:, :, j])
    signal = signal.reshape(B, L_pad)
    return signal * correction * (float(n_fft) / hop)


@functools.lru_cache(maxsize=256)
def _window_correction(n_valid: int, params: STFTParams,
                       l_pad: int) -> np.ndarray:
    """1/window_sumsquare over ``n_valid`` frames, padded to ``l_pad`` with
    1.0 — the exact correction ``dsp.stft.istft`` would apply to a signal
    with that frame count (same f64 accumulation, same tiny-guard)."""
    wss = window_sumsquare(n_valid, params.hop_length, params.win_length,
                           params.filter_length)
    tiny = np.finfo(np.float32).tiny
    corr = np.where(wss > tiny, 1.0 / np.maximum(wss, tiny), 1.0)
    out = np.ones((l_pad,), np.float32)
    out[: corr.shape[0]] = corr[:l_pad]
    return out


class StreamingDenoiser:
    """Window planner + fixed-shape device program for serving-chain denoise.

    One instance serves every session of a :class:`..server.ContinuousBatcher`
    (the scheduler batches all sessions' pending windows into shared
    ``denoise_windows`` calls).  ``bias_fn`` is read at every call so a live
    checkpoint swap (``POST /reload`` -> ``Synthesizer.load_weights``) takes
    effect with zero recompiles — the bias spectrum is a jit *argument*.

    Frame bookkeeping (all positions in SAMPLES of the raw vocoded signal;
    ``pad = n_fft // 2`` is the centered-STFT reflect padding):

    * frame ``f`` of the padded signal reads padded samples
      ``[f*hop, f*hop + n_fft)`` = raw samples ``[f*hop - pad, ...)``;
    * mid-stream (right reflect edge unknown) frame ``f`` is computable iff
      ``f*hop + n_fft <= A + pad`` for ``A`` raw samples buffered;
    * denoised sample ``P`` is emittable once all frames covering padded
      position ``P + pad`` are computable — the scheduler therefore holds
      back ``< n_fft`` samples until the session flushes;
    * the denoised stream ends at ``hop * (T // hop)`` samples, exactly the
      full-signal :func:`make_denoiser` output length (the reference's
      denoiser also returns the ISTFT-shortened signal,
      ``/root/reference/waveglow/denoiser.py:35-40``).
    """

    def __init__(self, bias_fn, params: STFTParams = None,
                 f_win: int = 72):
        self.params = params or DEFAULT_STFT_PARAMS
        n_fft, hop = self.params.filter_length, self.params.hop_length
        assert n_fft % hop == 0
        self.r = n_fft // hop
        assert f_win >= self.r + 1, "window must out-span the frame overlap"
        self.f_win = f_win
        self.l_pad = n_fft + hop * (f_win - 1)
        self.pad = n_fft // 2
        self._bias_fn = bias_fn
        self._jit = jax.jit(functools.partial(
            denoise_windows, params=self.params))

    # --- host planning -------------------------------------------------------

    def emit_bound(self, a: int, flushed: bool) -> int:
        """Largest denoised-sample frontier reachable with ``a`` raw samples
        buffered (the full output length once ``flushed``)."""
        n_fft, hop, pad = (self.params.filter_length, self.params.hop_length,
                           self.pad)
        if flushed:
            return hop * (a // hop)
        f_max = (a + pad - n_fft) // hop
        return max(0, (f_max + 1) * hop - pad)

    def plan(self, a: int, emitted: int, flushed: bool):
        """Window specs ``(f0, n_valid, e0, e1)`` advancing the denoised
        frontier from ``emitted`` to :meth:`emit_bound`: window frames
        ``[f0, f0 + n_valid)`` of the padded signal, emitting denoised
        samples ``[e0, e1)``.  Every emitted sample's covering frames are
        inside the window (the exactness condition of
        :func:`denoise_windows`); the final flush window ends at the
        signal's true last frame so the right window-sumsquare decay is the
        full-signal one."""
        n_fft, hop, pad = (self.params.filter_length, self.params.hop_length,
                           self.pad)
        bound = self.emit_bound(a, flushed)
        f_last = a // hop if flushed else (a + pad - n_fft) // hop
        specs = []
        d = emitted
        while d < bound:
            f0 = max(0, (d + pad - n_fft) // hop + 1)
            f_hi = min(f0 + self.f_win - 1, f_last)
            e1 = bound if (flushed and f_hi == f_last) else min(
                (f_hi + 1) * hop - pad, bound)
            assert e1 > d, "window does not advance (f_win too small?)"
            specs.append((f0, f_hi - f0 + 1, d, e1))
            d = e1
        return specs

    def fill_row(self, x_pad_row: np.ndarray, corr_row: np.ndarray,
                 window: np.ndarray, n_valid: int) -> None:
        """Write one window's samples + correction into pre-zeroed batch
        rows (``window`` = the ``n_fft + hop·(n_valid-1)`` padded-signal
        samples the plan's ``f0`` selects — ``DenoiseBuffer.window``)."""
        hop, n_fft = self.params.hop_length, self.params.filter_length
        need = n_fft + hop * (n_valid - 1)
        assert window.shape == (need,), (window.shape, need)
        x_pad_row[:need] = window
        corr_row[:] = _window_correction(n_valid, self.params, self.l_pad)

    # --- device call ---------------------------------------------------------

    def __call__(self, x_pad: np.ndarray, strengths: np.ndarray,
                 n_valid: np.ndarray, correction: np.ndarray) -> np.ndarray:
        return np.asarray(self._jit(
            jnp.asarray(x_pad), jnp.asarray(self._bias_fn()),
            jnp.asarray(strengths, jnp.float32),
            jnp.asarray(n_valid, jnp.int32), jnp.asarray(correction)))


def serving_denoiser(bias_fn, params: STFTParams, chunk_steps: int,
                     upsample_stride: int) -> StreamingDenoiser:
    """The ONE window-sizing rule for every serving surface (the
    continuous-batching server, its TP twin, and both synthesizers'
    incremental paths): the window spans one scheduling round's audio
    intake plus both frame margins."""
    r = params.filter_length // params.hop_length
    f_win = max(r + 2, -(-chunk_steps * upsample_stride
                         // params.hop_length) + 2 * r)
    return StreamingDenoiser(bias_fn, params, f_win=f_win)


def cached_stream_denoiser(holder, key, bias_fn, params: STFTParams,
                           chunk_steps: int,
                           upsample_stride: int) -> StreamingDenoiser:
    """Per-``holder`` cache of a :func:`serving_denoiser`: rebuilt only
    when ``key`` (the holder's STFT-config + chunk_steps identity)
    changes.  ``bias_fn`` is read at denoise time, so live bias swaps
    (``/reload``) never invalidate the cache.  One definition shared by
    ``Synthesizer.synthesize_incremental`` and its tensor-parallel twin
    so the cache-invalidation rule cannot drift between them."""
    if getattr(holder, "_stream_den_key", None) != key:
        holder._stream_den = serving_denoiser(
            bias_fn, params, chunk_steps, upsample_stride)
        holder._stream_den_key = key
    return holder._stream_den


class DenoiseBuffer:
    """Bounded raw-audio buffer for ONE denoising session.

    Holds the raw vocoder samples a session has produced but not yet
    denoise-emitted, plus the window margin.  After the emit frontier
    reaches ``D``, no future window reads raw positions below
    ``D - n_fft`` (``plan``'s ``f0`` is non-decreasing), so the emitted
    prefix is dropped — total host work stays O(S) per session instead of
    the O(S · rounds) a re-concatenate-everything-per-round approach
    costs, and a long session never pins its whole waveform.  Reflect
    edges are materialized only for windows that actually touch a true
    signal edge (the left edge exists only before any trim; the right
    only on flush)."""

    def __init__(self, den: StreamingDenoiser):
        self.den = den
        self._parts: list = []
        self.start = 0          # absolute raw index of the buffer head
        self.total = 0          # absolute raw samples appended so far

    def append(self, chunk) -> None:
        c = np.asarray(chunk, np.float32)
        if c.size:
            self._parts.append(c)
            self.total += c.size

    def _buf(self) -> np.ndarray:
        if len(self._parts) != 1:
            self._parts = [
                np.concatenate(self._parts) if self._parts
                else np.zeros((0,), np.float32)
            ]
        return self._parts[0]

    def window(self, f0: int, n_valid: int, flushed: bool) -> np.ndarray:
        """Padded-signal samples ``[f0·hop, f0·hop + n_fft + hop·(n_valid
        - 1))`` — the :meth:`StreamingDenoiser.fill_row` source."""
        p = self.den.params
        hop, pad, n_fft = p.hop_length, self.den.pad, p.filter_length
        need = n_fft + hop * (n_valid - 1)
        lo = f0 * hop - pad                 # absolute raw coords
        hi = lo + need
        buf = self._buf()
        lpad = pad if lo < 0 else 0
        rpad = pad if (flushed and hi > self.total) else 0
        if lpad or rpad:
            # true-edge reflect; trimming guarantees the buffer still
            # holds the signal head (left) / >= pad+1 tail samples (right)
            assert lpad == 0 or self.start == 0
            ext = np.pad(buf, (lpad, rpad), mode="reflect")
            off = self.start - lpad
        else:
            ext, off = buf, self.start
        a = lo - off
        assert 0 <= a and a + need <= ext.shape[0], (lo, hi, self.start)
        return ext[a : a + need]

    def trim(self, emitted: int) -> None:
        """Drop samples no future window can read (hysteresis of a few
        windows so the copy amortizes to O(1) per appended sample)."""
        p = self.den.params
        keep_from = emitted - p.filter_length - p.hop_length
        if keep_from - self.start < 4 * self.den.l_pad:
            return
        buf = self._buf()
        self._parts = [buf[keep_from - self.start :].copy()]
        self.start = keep_from


def denoise_stream(chunks, den: StreamingDenoiser, strength: float):
    """Wrap an audio-chunk iterator with windowed denoising: yields
    bias-subtracted chunks whose concatenation equals the offline denoise
    of the concatenated input stream (``< n_fft`` samples of added
    latency mid-stream; the output ends at ``hop·⌊T/hop⌋`` like the
    offline ISTFT).  The single-session form of the scheduler's
    ``_run_denoise`` (``server.py``); used by
    ``Synthesizer.synthesize_incremental(denoiser_strength=...)``."""
    hop, pad = den.params.hop_length, den.pad
    buf = DenoiseBuffer(den)
    emitted = 0

    def _emit(flushed):
        nonlocal emitted
        specs = den.plan(buf.total, emitted, flushed)
        if not specs:
            return None
        outs = []
        for f0, nv, e0, e1 in specs:
            x = np.zeros((1, den.l_pad), np.float32)
            corr = np.ones((1, den.l_pad), np.float32)
            den.fill_row(x[0], corr[0], buf.window(f0, nv, flushed), nv)
            o = den(x, np.asarray([strength], np.float32),
                    np.asarray([nv], np.int32), corr)
            outs.append(o[0, e0 + pad - f0 * hop : e1 + pad - f0 * hop])
            emitted = e1
        buf.trim(emitted)
        return np.concatenate(outs)

    for c in chunks:
        buf.append(c)
        out = _emit(False)
        if out is not None and out.size:
            yield out
    if buf.total:
        out = _emit(True)
        if out is not None and out.size:
            yield out
