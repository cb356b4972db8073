"""End-to-end synthesis: text -> mel (Tacotron-2 autoregressive) -> waveform
(WaveGlow reverse flow) -> PCM16 wav.

Rebuild of ``/root/reference/inference.py``: same pipeline, but both stages
are jitted and batched — the decoder is a fixed-trip scan and WaveGlow infer
has no sequential time dependency, so a whole batch of sentences synthesizes
in two device calls.  bf16 is used where safe (the reference's fp16-with-fp32
convinv dance, ``inference.py:59-75``, becomes the model's built-in fp32
islands).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .config import HParams, WaveGlowConfig
from .data.dataset import Batch  # noqa: F401  (re-export convenience)
from .dsp.audio import save_wav
from .models.tacotron2 import Tacotron2
from .models.waveglow import WaveGlow
from .text import N_SYMBOLS, encode_batch


def chunked_mel_stream(hp, carry, decode_fn, postnet_fn, requested: int,
                       chunk_steps: int, all_rngs):
    """Shared chunked-decode + windowed-postnet engine.

    Drives ``decode_fn(carry, step_rngs) -> (carry, mel_chunk, active)`` in
    whole chunks and yields ``(mel_post_chunk [B, n_mel, n],
    out_lengths_so_far [B], final)``.  Used by both the single-device
    ``Synthesizer.text_to_mel_stream`` and the tensor-parallel
    ``parallel.serve.TPSynthesizer`` so the decode-loop contract (limit
    rounding, out_length accounting, postnet edge handling) lives once.

    Emitted frames equal the full-sequence batch path
    (``Tacotron2.inference``) on every VALID frame: non-final windows only
    emit frames a full postnet receptive field away from the decoded
    frontier, and when every row's gate has fired the loop keeps decoding
    ``ceil(prf / chunk_steps)`` extra chunks before declaring final — the
    batch path's postnet reads REAL decoded context past the last stop
    frame (its scan always runs all ``requested`` steps), so stopping at
    the gate would change the last ``prf`` valid frames.  Frames beyond a
    row's stop remain garbage (the batch path masks them; streaming
    consumers cut at ``out_lengths``)."""
    prf = (hp.postnet_kernel_size // 2) * hp.postnet_n_convolutions
    limit = -(-requested // chunk_steps) * chunk_steps
    assert len(all_rngs) >= limit, (len(all_rngs), limit)
    tail_chunks = -(-prf // chunk_steps)

    B = carry[2].shape[0]
    chunks: list = []
    total = emitted = 0
    out_len = np.zeros((B,), np.int64)
    tail = None
    while total < limit:
        sr = all_rngs[total : total + chunk_steps]
        carry, mel_c, active = decode_fn(carry, sr)
        chunks.append(mel_c)
        chunk_start = total
        total += chunk_steps
        n_in_contract = max(0, min(chunk_steps, requested - chunk_start))
        out_len += np.asarray(active)[:, :n_in_contract].sum(axis=1)
        if tail is None:
            if bool(np.asarray(carry[2]).all()):
                tail = tail_chunks
        else:
            tail -= 1
        cap = min(total, requested)
        final = total >= limit or tail == 0
        upto = cap if final else max(emitted, cap - prf)
        if upto > emitted:
            mel_all = (
                jnp.concatenate(chunks, axis=-1)
                if len(chunks) > 1 else chunks[0]
            )
            ws = max(0, emitted - prf)
            # the window never reads past `cap`: past `requested` the batch
            # path's postnet sees conv zero-padding, and on an early-gate
            # final the tail chunks above guarantee every VALID frame's
            # window touches only real decoded frames
            win = mel_all[:, :, ws:cap]
            post = win + postnet_fn(win)
            yield (
                np.asarray(post[:, :, emitted - ws : upto - ws]),
                out_len.copy(),
                final,
            )
            emitted = upto
        if final:
            return


def incremental_vocode_stream_batch(cfg, mel_stream, vocode_fn,
                                    sigma: float, seed: int,
                                    chunk_steps: int,
                                    vocode_masked_fn=None):
    """Multi-stream streaming-vocode engine: turn a BATCHED chunked mel
    stream (B concurrent utterances decoded in one lockstep scan) into
    per-row waveform chunks, yielding ``(row, chunk)`` pairs.

    ``mel_stream`` yields ``(mel_chunk [B, n_mel, n], out_len [B], final)``
    (the :func:`chunked_mel_stream` contract);
    ``vocode_fn(mel, noise_tuple, sigma) -> np.ndarray [B, samples]`` runs
    the vocoder on a stack of windows.  Window/noise rules are exactly the
    single-stream engine's (this IS that engine — B=1 wraps it):

    * one noise draw per decoded chunk covering all B rows
      (position-consistent: windows slice the same stream), so row ``r``'s
      emitted audio equals a single-pass vocode of its final mel
      ``[:, :true_len_r]`` with ``noise[r]`` to float tolerance;
    * mid-stream windows emit a chunk once a full receptive field of real
      right context exists; ws clamps to 0 so early windows are PINNED to
      the utterance start: zero-filled positions left of 0 would carry
      zero NOISE, which the flows turn into bias-driven hidden values that
      leak into the first emitted chunk (measured 0.0066 first-chunk error
      unclamped vs 5e-7 pinned) — at ws=0 the window's left edge is the
      true conv zero-padding, exactly like ``infer_long``'s boundary
      windows;
    * windows are bounded by ``true_len_r = min(out_len_r, frames)``, not
      the decoded frontier: once a row's gate has fired, later frames are
      post-stop garbage (the decode tail chunks exist only as postnet
      context) and must never enter a window or be emitted;
    * a row whose gate has fired is flushed as soon as its real frames
      have all cleared the mel stream — it does not wait for the slowest
      row in the batch; flush windows stay pinned INSIDE
      ``[0, true_len_r]`` (left edge clamps to the start, right edge to
      the row's end);
    * a row shorter than one window (``true_len <= W`` before any
      emission) vocodes its exact length in one pass.  With
      ``vocode_masked_fn`` (the Synthesizer's default on the plain
      vocoder path) that pass is a masked-length program at the fixed
      window width — the true length is a TRACED scalar, so every
      distinct short length rides ONE compiled program; without it,
      each distinct short length compiles its own exact-shape program.

    Each emission round stacks the ready rows' windows host-side into
    ``[B, n_mel, W]`` batches (padding a short round by repeating its
    first task, outputs discarded), so concurrent streams cost ~one
    batched vocoder call per round — and the lockstep decode means batch
    size is nearly free on the weight-streaming-bound decode side too:
    N concurrent streams each see ~single-stream first-audio latency."""
    from .models.chunked import draw_noise, receptive_overlap_frames

    hop = cfg.upsample_stride
    gpf = hop // cfg.n_group
    ov = receptive_overlap_frames(cfg)
    cs = chunk_steps
    W = cs + 2 * ov                    # vocoder window width, frames
    W1 = cs + ov                       # first-window width (ws pinned at 0)

    key = jax.random.PRNGKey(seed + 1)
    noise_parts: list | None = None
    mel_parts: list = []
    F = 0                              # final (postnet-done) mel frames
    E: np.ndarray | None = None        # [B] frames vocoded+emitted per row
    flushed: np.ndarray | None = None  # [B] row fully emitted

    def mel_cat():
        return (
            np.concatenate(mel_parts, axis=-1)
            if len(mel_parts) > 1 else mel_parts[0]
        )

    def run_windows(tasks, width):
        """tasks: (row, ws, keep_from, keep_to, f_lim) window specs; one
        batched vocode call per group of B, window content zero-filled
        outside [0, f_lim) — the conv zero padding."""
        mel = mel_cat()
        B = mel.shape[0]
        for g0 in range(0, len(tasks), B):
            group = tasks[g0 : g0 + B]
            pad_n = B - len(group)
            rows = group + [group[0]] * pad_n      # repeat = discarded
            wmel = np.zeros((B, mel.shape[1], width), np.float32)
            wnoise = [
                np.zeros((B, width * gpf, comp.shape[-1]), np.float32)
                for comp in noise_parts
            ]
            for j, (r, ws, _kf, _kt, fl) in enumerate(rows):
                s, e = max(ws, 0), min(ws + width, fl)
                wmel[j, :, s - ws : e - ws] = mel[r, :, s:e]
                for z, comp in zip(wnoise, noise_parts):
                    z[j, (s - ws) * gpf : (e - ws) * gpf] = (
                        comp[r, s * gpf : e * gpf]
                    )
            audio = np.asarray(vocode_fn(
                jnp.asarray(wmel),
                tuple(jnp.asarray(z) for z in wnoise), sigma,
            ))
            for j, (r, ws, kf, kt, _fl) in enumerate(group):
                yield r, audio[j, (kf - ws) * hop : (kt - ws) * hop]

    def vocode_exact(r, tl):
        if vocode_masked_fn is not None:
            # masked-length pass: pad to the fixed window width and pass
            # the true length TRACED — one compiled program serves every
            # short length (vs one exact-shape compile per distinct tl);
            # the in-tensor zero tail is made exactly equivalent to the
            # conv zero padding of the exact call by WaveGlow.infer's
            # per-layer re-zeroing (tests/test_waveglow.py pins it)
            mel = mel_cat()
            wmel = np.zeros((1, mel.shape[1], W), np.float32)
            wmel[0, :, :tl] = mel[r, :, :tl]
            nz = []
            for comp in noise_parts:
                z = np.zeros((1, W * gpf, comp.shape[-1]), np.float32)
                z[0, : tl * gpf] = comp[r, : tl * gpf]
                nz.append(jnp.asarray(z))
            return np.asarray(vocode_masked_fn(
                jnp.asarray(wmel), tuple(nz), sigma, tl
            ))[0, : tl * hop]
        mel = jnp.asarray(mel_cat()[r : r + 1, :, :tl])
        nz = tuple(
            jnp.asarray(z[r : r + 1, : tl * gpf]) for z in noise_parts
        )
        return np.asarray(vocode_fn(mel, nz, sigma))[0, : tl * hop]

    ci = 0
    for mel_chunk, out_len, final in mel_stream:
        n_new = mel_chunk.shape[-1]
        mel_parts.append(np.asarray(mel_chunk, np.float32))
        B = mel_parts[0].shape[0]
        if E is None:
            E = np.zeros((B,), np.int64)
            flushed = np.zeros((B,), bool)
        # extend the noise stream to cover the new frames (one draw per
        # chunk for ALL rows, position-consistent across windows)
        new_noise = draw_noise(
            cfg, jax.random.fold_in(key, ci), B, n_new * gpf
        )
        ci += 1
        if noise_parts is None:
            noise_parts = [np.asarray(z) for z in new_noise]
        else:
            noise_parts = [
                np.concatenate([a, np.asarray(z)], axis=1)
                for a, z in zip(noise_parts, new_noise)
            ]
        F += n_new
        out_len = np.asarray(out_len, np.int64)
        true_len = np.minimum(out_len, F)

        tasks: list = []
        shorts: list = []
        for r in range(B):
            if flushed[r]:
                continue
            tl = int(true_len[r])
            while not final and tl >= E[r] + cs + ov:
                tasks.append(
                    (r, max(int(E[r]) - ov, 0), int(E[r]),
                     int(E[r]) + cs, tl)
                )
                E[r] += cs
            # row complete: the stream ended, or this row's gate fired
            # (out_len frozen below the emitted frontier) and all its real
            # frames have cleared the postnet (tl = out_len <= F)
            if final or int(out_len[r]) < F:
                if tl <= W:
                    # exact-length pass for ANY row shorter than one
                    # window — even one that already emitted mid-stream:
                    # a fixed-width window would zero-fill [tl, W)
                    # IN-TENSOR, and zero mel+noise positions are real
                    # frames to the flows (not conv padding) whose
                    # bias-driven hidden values leak back into the last
                    # ~ov real frames.  Emit only the un-emitted suffix.
                    if tl > int(E[r]):
                        shorts.append((r, int(E[r]), tl))
                        E[r] = tl
                else:
                    while E[r] < tl:
                        kt = min(int(E[r]) + cs, tl)
                        ws = max(0, min(int(E[r]) - ov, tl - W))
                        tasks.append((r, ws, int(E[r]), kt, tl))
                        E[r] = kt
                flushed[r] = True
        if tasks:
            # First-window fast path: a window pinned at the utterance
            # start (ws=0) emitting [kf, kt) with kt <= cs needs only
            # kt + ov <= W1 frames of real context — the trailing ov
            # frames of the fixed W window would be pure zero-fill
            # outside every emitted sample's receptive field.  Shrinking
            # it cuts the FIRST vocode round (the whole of first-audio
            # latency for simultaneous starts) by ~ov/W ≈ 38% at default
            # shapes.  Only all-first rounds shrink: a mixed round stays
            # at W so it still batches into the minimum number of calls.
            if all(t[1] == 0 and t[3] <= cs for t in tasks):
                yield from run_windows(tasks, W1)
            else:
                yield from run_windows(tasks, W)
        for r, e0, tl in shorts:
            yield r, vocode_exact(r, tl)[e0 * hop :]


def incremental_vocode_stream(cfg, mel_stream, vocode_fn, sigma: float,
                              seed: int, chunk_steps: int,
                              vocode_masked_fn=None):
    """Single-stream streaming-vocode engine: turn a chunked mel stream
    into waveform chunks with receptive-field windows over
    position-consistent noise.  Used by
    :meth:`Synthesizer.synthesize_incremental` and the tensor-parallel
    ``parallel.serve.TPSynthesizer.synthesize_incremental``.

    ``mel_stream`` yields ``(mel_chunk [1, n_mel, n], out_len [1], final)``
    (the :func:`chunked_mel_stream` contract);
    ``vocode_fn(mel, noise_tuple, sigma) -> np.ndarray [1, samples]`` runs
    the vocoder on one window.  Emitted audio equals a single-pass vocode
    of the final mel with the same noise to float tolerance; windows and
    the final flush are pinned inside the true utterance exactly like
    ``models.chunked.infer_long``'s boundary windows.  This is the B=1
    case of :func:`incremental_vocode_stream_batch` (one engine, pinned by
    the toy-vocoder contract test in ``tests/test_streaming.py``)."""
    for _row, chunk in incremental_vocode_stream_batch(
        cfg, mel_stream, vocode_fn, sigma, seed, chunk_steps,
        vocode_masked_fn=vocode_masked_fn,
    ):
        yield chunk



@dataclass
class Synthesizer:
    hp: HParams
    taco: Tacotron2
    taco_variables: dict
    wg_cfg: WaveGlowConfig
    waveglow: WaveGlow
    wg_variables: dict
    use_denoiser: bool = True
    use_fused_vocoder: bool = False   # fused-Pallas serving path (TPU)
    int8_vocoder: bool = False        # int8 WN kernels (implies fused;
                                      # measured 1.54x the bf16 fused path,
                                      # 1.62x the V100 anchor — see
                                      # docs/KERNELS.md step 8)
    quantized_decode: bool = False    # int8 decoder weights for the
                                      # streaming decode path (decode is
                                      # weight-streaming-bound; measured
                                      # 1.61x decode throughput)
    denoiser_kwargs: dict | None = None   # make_denoiser overrides (tests
                                          # shrink the STFT to fit tiny
                                          # synthetic utterances)

    def __post_init__(self):
        # Params are jit ARGUMENTS, never closure captures — captured arrays
        # are baked into the HLO as constants, ballooning compile time (XLA
        # constant-folds e.g. the weight-norm reductions over full tensors)
        # and forcing a recompile per checkpoint.
        taco, wg = self.taco, self.waveglow

        def mel_fn(variables, text_ids, text_lengths, rng, max_steps,
                   speaker_ids=None):
            return taco.apply(
                variables,
                text_ids,
                speaker_ids=speaker_ids,
                text_lengths=text_lengths,
                max_steps=max_steps,
                method=Tacotron2.inference,
                rngs={"dropout": rng},
            )

        wg_cfg = self.wg_cfg
        if self.int8_vocoder:
            from .models.waveglow_fused import (
                infer_fused_int8,
                quantize_waveglow_int8,
            )

            # quantize once per checkpoint, under jit (eager ops over the
            # device tunnel are ~seconds EACH, CLAUDE.md gotcha #5); the
            # result replaces wg_variables as the serving-side jit argument.
            # The jitted quantizer is CACHED on self so load_weights swaps
            # reuse the compiled pass instead of re-tracing a fresh lambda
            self._quantize_wg = jax.jit(
                lambda p: quantize_waveglow_int8(p, wg_cfg))
            self._wg_serve_vars = self._quantize_wg(
                self.wg_variables["params"])

            def audio_fn(qparams, mel, rng, sigma):
                return infer_fused_int8(qparams, wg_cfg, mel, rng, sigma)
        elif self.use_fused_vocoder:
            from .models.waveglow_fused import infer_fused

            self._wg_serve_vars = self.wg_variables

            def audio_fn(variables, mel, rng, sigma):
                return infer_fused(variables["params"], wg_cfg, mel, rng, sigma)
        else:
            self._wg_serve_vars = self.wg_variables

            def audio_fn(variables, mel, rng, sigma):
                return wg.apply(
                    variables, mel, rng, sigma, method=WaveGlow.infer
                )

        from .models.chunked import infer_long

        use_fused = self.use_fused_vocoder
        use_int8 = self.int8_vocoder

        def audio_long_fn(variables, mel, noise, sigma, chunk, ov):
            return infer_long(
                wg, variables, mel, None, sigma, chunk, ov, noise=noise,
                fused=use_fused,
                int8_params=variables if use_int8 else None,
            )

        self._infer_mel = jax.jit(mel_fn, static_argnames=("max_steps",))
        self._infer_audio = jax.jit(audio_fn)
        self._infer_audio_long = jax.jit(
            audio_long_fn, static_argnames=("chunk", "ov")
        )

        # --- incremental decode handles (jitted lazily on first use) -------
        # the four replicated endpoints are shared with the TP serving
        # chain (one definition; see tacotron_serve.replicated_endpoints)
        from .models.tacotron_serve import replicated_endpoints

        (self._encode_mem, self._pmem_fn, self._derive_rng,
         self._postnet_window) = replicated_endpoints(taco)

        def decode_chunk_fn(variables, memory, state, frame, finished,
                            step_rngs, lengths):
            return taco.apply(
                variables, memory, state, frame, finished, step_rngs,
                text_lengths=lengths, method=Tacotron2.decode_chunk,
            )

        if self.int8_vocoder:

            def vocode_window_fn(qparams, mel, noise, sigma):
                return infer_fused_int8(
                    qparams, wg_cfg, mel, None, sigma, noise=noise
                )
        elif self.use_fused_vocoder:

            def vocode_window_fn(variables, mel, noise, sigma):
                return infer_fused(
                    variables["params"], wg_cfg, mel, None, sigma, noise=noise
                )
        else:

            def vocode_window_fn(variables, mel, noise, sigma):
                return wg.apply(
                    variables, mel, None, sigma, noise=noise,
                    method=WaveGlow.infer,
                )

        self._decode_chunk = jax.jit(decode_chunk_fn)
        self._vocode_window = jax.jit(vocode_window_fn)

        # Exact-pass program for sessions shorter than one vocoder window:
        # ONE fixed-width masked-length program (WaveGlow.infer(length=...),
        # length TRACED) serves ALL short lengths — without it every
        # distinct short-utterance length compiles its own exact-shape
        # program (up to ~W programs, minutes each over the TPU tunnel,
        # stalling the serving scheduler thread).  Plain path only: the
        # fused/int8 Pallas kernels take a static n_valid, so those chains
        # keep the per-length exact pass.
        if self.int8_vocoder or self.use_fused_vocoder:
            self._vocode_masked = None
        else:

            def vocode_masked_fn(variables, mel, noise, sigma, length):
                return wg.apply(
                    variables, mel, None, sigma, noise=noise,
                    length=length, method=WaveGlow.infer,
                )

            self._vocode_masked = jax.jit(vocode_masked_fn)

        if self.quantized_decode:
            from .models.tacotron_serve import (
                decode_chunk_serve,
                extract_decoder_params,
                quantize_decoder_params,
            )

            hp = self.hp
            dec_dtype = taco.compute_dtype or jnp.float32
            # under jit (gotcha #5: eager ops over the tunnel are ~seconds
            # EACH — the quantize pass is ~25 small ops) and CACHED so
            # load_weights swaps reuse the compiled pass
            self._quantize_dp = jax.jit(
                lambda v: quantize_decoder_params(
                    extract_decoder_params(v, hp)))
            self._dp_q = self._quantize_dp(self.taco_variables)
            # memory projection: self._pmem_fn (shared endpoint above)
            self._decode_chunk_q = jax.jit(
                lambda dp, mem, pm, st, fr, fi, sr_, le: decode_chunk_serve(
                    dp, hp, mem, pm, st, fr, fi, sr_, le, dtype=dec_dtype
                )
            )
        if self.use_denoiser:
            from .models.denoiser import make_denoiser_programs

            kw = self.denoiser_kwargs or {}
            # programs built ONCE and cached (like _quantize_wg/_quantize_dp):
            # load_weights swaps checkpoints with one compute_bias execution,
            # zero retraces — /reload runs on the scheduler thread, where a
            # retrace+compile (minutes on this rig) would stall live sessions
            (self._denoise_bias_fn, self._denoise_raw,
             self._denoise_params) = make_denoiser_programs(
                self.waveglow, **kw)
            self._denoise_bias = self._denoise_bias_fn(self.wg_variables)
            # reads the CURRENT bias at call time, so a swap is live
            # everywhere this handle is held (CLIs, tests)
            self._denoise = lambda audio, strength=0.1: self._denoise_raw(
                audio, self._denoise_bias, strength)
        else:
            self._denoise_bias = None
            self._denoise = None
            self._denoise_params = None

    # --- public API --------------------------------------------------------

    def load_weights(self, taco_variables: dict | None = None,
                     wg_variables: dict | None = None):
        """Swap checkpoints in place with ZERO recompiles: params are jit
        ARGUMENTS everywhere (never closure captures), so the existing
        compiled programs serve the new weights on the next call.  Derived
        serving weights (int8 quantization, denoiser handle) are rebuilt
        the same way ``__post_init__`` built them.  A running
        continuous-batching server (``server.make_server``) reads weights
        through this object and picks the swap up on its next round —
        in-flight sessions see the new weights mid-utterance, so drain
        first if that matters."""
        if taco_variables is not None:
            self.taco_variables = taco_variables
            if self.quantized_decode:
                # reuse the jit cache from __post_init__: the swap costs
                # one execution, zero compiles, zero eager tunnel ops
                self._dp_q = self._quantize_dp(taco_variables)
        if wg_variables is not None:
            self.wg_variables = wg_variables
            if self.int8_vocoder:
                # reuse the jit cache from __post_init__: the swap costs
                # one execution, zero compiles
                self._wg_serve_vars = self._quantize_wg(
                    wg_variables["params"])
            else:
                self._wg_serve_vars = wg_variables
            if self.use_denoiser:
                # cached program from __post_init__: one execution, zero
                # retraces (same pattern as the int8 quantize passes)
                self._denoise_bias = self._denoise_bias_fn(wg_variables)

    def load_checkpoints(self, taco_ckpt_dir: str | None = None,
                         wg_ckpt_dir: str | None = None):
        """Restore either/both models from Orbax checkpoint dirs and swap
        them in via :meth:`load_weights` (zero recompiles).  The current
        weights are the restore template, so shapes must match — this is
        the live-upgrade path for a running server (HTTP ``POST /reload``)."""
        from .train.checkpoint import CheckpointManager
        from .train.state import TrainState, create_train_state

        tv = wv = None
        if taco_ckpt_dir is not None:
            tstate = create_train_state(self.hp, self.taco_variables)
            tstate, _ = CheckpointManager(taco_ckpt_dir).restore(tstate)
            tv = {"params": tstate.params, "batch_stats": tstate.batch_stats}
        if wg_ckpt_dir is not None:
            import optax

            tx = optax.adam(self.wg_cfg.learning_rate)
            wstate = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=self.wg_variables["params"], batch_stats={},
                opt_state=tx.init(self.wg_variables["params"]), tx=tx,
            )
            wstate, _ = CheckpointManager(wg_ckpt_dir).restore(wstate)
            wv = {"params": wstate.params}
        self.load_weights(tv, wv)

    def _speaker_array(self, speaker_id, B: int):
        """Voice-selection knob -> [B] int32 device array or None (shared
        validation: ``tacotron_serve.speaker_ids_array``; the reference
        conditions its 2-speaker demo this way, ``inference.py:51-87``)."""
        from .models.tacotron_serve import speaker_ids_array

        ids = speaker_ids_array(speaker_id, B, self.taco.num_speakers)
        return None if ids is None else jnp.asarray(ids)

    def text_to_mel(self, texts, seed: int = 0, max_steps: int | None = None,
                    with_align: bool = False, speaker_id=None):
        """list[str] -> (mel_post [B, n_mel, T], out_lengths [B]).

        ``with_align=True`` additionally returns the attention alignment
        [B, T_dec, T_enc] for synthesis-time diagnostics (the reference
        renders it per utterance, ``inference.py:88-90``).  ``speaker_id``
        (int or per-text sequence) selects the voice on a multi-speaker
        model (reference ``inference.py:83-87``)."""
        ids, lengths = encode_batch(texts)
        rng = jax.random.PRNGKey(seed)
        _, mel_post, _, align, out_lengths = self._infer_mel(
            self.taco_variables, jnp.asarray(ids), jnp.asarray(lengths), rng,
            max_steps=max_steps,
            speaker_ids=self._speaker_array(speaker_id, ids.shape[0]),
        )
        if with_align:
            return mel_post, out_lengths, align
        return mel_post, out_lengths

    def mel_to_audio(self, mel, sigma: float = 0.666, seed: int = 0,
                     denoiser_strength: float = 0.0):
        audio = self._infer_audio(
            self._wg_serve_vars, mel, jax.random.PRNGKey(seed + 1), sigma
        )
        if denoiser_strength > 0 and self._denoise is not None:
            audio = self._denoise(audio, denoiser_strength)
        return audio

    def mel_to_audio_long(
        self,
        mel,
        sigma: float = 0.666,
        seed: int = 0,
        denoiser_strength: float = 0.0,
        chunk_frames: int = 256,
        overlap_frames: int | None = None,
    ):
        """Frame-axis chunked vocoding for arbitrarily long mels
        (:mod:`.models.chunked`): bounded per-window activation memory, all
        windows in one batched device call."""
        from .models.chunked import draw_noise

        gpf = self.wg_cfg.upsample_stride // self.wg_cfg.n_group
        noise = draw_noise(
            self.wg_cfg,
            jax.random.PRNGKey(seed + 1),
            mel.shape[0],
            mel.shape[2] * gpf,
        )
        audio = self._infer_audio_long(
            self._wg_serve_vars, mel, noise, sigma,
            chunk=chunk_frames, ov=overlap_frames,
        )
        if denoiser_strength > 0 and self._denoise is not None:
            audio = self._denoise(audio, denoiser_strength)
        return audio

    def synthesize_long(
        self,
        texts,
        sigma: float = 0.666,
        seed: int = 0,
        denoiser_strength: float = 0.0,
        max_steps: int | None = None,
        chunk_frames: int = 256,
        overlap_frames: int | None = None,
        speaker_id=None,
    ):
        """Like :meth:`synthesize` but vocodes through the chunked long-form
        path — use for utterances whose mels exceed comfortable single-pass
        activation memory."""
        mel_post, out_lengths = self.text_to_mel(texts, seed, max_steps,
                                                 speaker_id=speaker_id)
        T = int(np.max(np.asarray(out_lengths)))
        audio = self.mel_to_audio_long(
            mel_post[:, :, :T], sigma, seed, denoiser_strength,
            chunk_frames, overlap_frames,
        )
        audio = np.asarray(audio)
        hop = self.wg_cfg.upsample_stride
        return [
            audio[i, : int(out_lengths[i]) * hop]
            for i in range(audio.shape[0])
        ]

    def synthesize(
        self,
        texts,
        sigma: float = 0.666,
        seed: int = 0,
        denoiser_strength: float = 0.0,
        max_steps: int | None = None,
        speaker_id=None,
    ):
        """list[str] -> list of float32 waveforms (trimmed to true lengths);
        ``speaker_id`` selects the voice on multi-speaker models."""
        mel_post, out_lengths = self.text_to_mel(texts, seed, max_steps,
                                                 speaker_id=speaker_id)
        # trim batch to the longest real utterance to bound vocoder work
        T = int(np.max(np.asarray(out_lengths)))
        audio = self.mel_to_audio(
            mel_post[:, :, :T], sigma, seed, denoiser_strength
        )
        audio = np.asarray(audio)
        # the vocoder emits upsample_stride samples per mel frame (==
        # hop_length on the reference config, but not on shrunk test
        # configs — trimming by hop_length there silently no-ops)
        hop = self.wg_cfg.upsample_stride
        return [
            audio[i, : int(out_lengths[i]) * hop]
            for i in range(audio.shape[0])
        ]

    def synthesize_stream(
        self,
        text: str,
        sigma: float = 0.666,
        seed: int = 0,
        denoiser_strength: float = 0.0,
        max_batch: int = 8,
        max_steps: int | None = None,
        speaker_id: int | None = None,
    ):
        """Incremental synthesis of long-form text: split into sentences
        (the normalizer's punkt-equivalent splitter), synthesize
        ``max_batch`` sentences per device call, and yield
        ``(sentence, waveform)`` pairs in reading order as each batch
        completes — first audio is ready after one batch instead of after
        the whole document."""
        from .text import split_sentences

        sentences = split_sentences(text)
        for i in range(0, len(sentences), max_batch):
            chunk = sentences[i : i + max_batch]
            wavs = self.synthesize(
                chunk, sigma=sigma, seed=seed,
                denoiser_strength=denoiser_strength, max_steps=max_steps,
                speaker_id=speaker_id,
            )
            for sent, wav in zip(chunk, wavs):
                yield sent, wav

    def text_to_mel_stream(
        self,
        texts,
        chunk_steps: int = 64,
        seed: int = 0,
        max_steps: int | None = None,
        speaker_id=None,
    ):
        """Incremental text -> mel: yields ``(mel_post_chunk [B, n_mel, n],
        out_lengths_so_far [B], final)`` as the decoder advances, instead of
        waiting for the full ``max_decoder_steps`` scan.

        Chunked decoding is BITWISE the batch :meth:`text_to_mel` decode
        (same carry, same per-step dropout keys via
        ``Tacotron2.derive_rng``); the postnet is applied over windows with
        its full receptive field of context, so emitted frames equal the
        full-sequence postnet output.  Frames beyond a row's stop frame are
        garbage (the batch path masks them at the end; streaming consumers
        cut at ``out_lengths``)."""
        from .models.tacotron2 import DecoderState

        from .models.tacotron_serve import int8_decode_worthwhile

        texts = [texts] if isinstance(texts, str) else texts
        ids_np, lengths_np = encode_batch(texts)
        ids, lengths = jnp.asarray(ids_np), jnp.asarray(lengths_np)
        memory = self._encode_mem(
            self.taco_variables, ids, lengths,
            self._speaker_array(speaker_id, ids.shape[0]))
        B, T_in, _ = memory.shape
        # measured-benefit precision selection: int8 decode only wins once
        # the batch is big enough that weight streaming dominates (below
        # the threshold XLA VMEM-pins the bf16 kernels and int8 is a
        # wash-to-loss, r3 driver record) — int8 must never decode slower
        use_q = self.quantized_decode and int8_decode_worthwhile(B)
        pmem = (
            self._pmem_fn(self.taco_variables, memory) if use_q else None
        )
        hp = self.hp
        dt = memory.dtype

        def z(d):
            return jnp.zeros((B, d), dt)

        state = DecoderState(
            z(hp.attention_rnn_dim), z(hp.attention_rnn_dim),
            z(hp.decoder_rnn_dim), z(hp.decoder_rnn_dim),
            jnp.zeros((B, T_in), dt), jnp.zeros((B, T_in), dt),
            z(hp.enc_conv_channels),
        )
        frame = jnp.zeros((B, hp.n_mel_channels), dt)
        finished = jnp.zeros((B,), bool)

        # the decode scan runs in whole chunks, but the EMITTED frames and
        # the reported out_lengths honor the requested max_steps contract
        # exactly (the batch path decodes exactly `requested` steps; frames
        # past it "don't exist" and must not leak out or into the postnet's
        # end context)
        requested = max_steps or hp.max_decoder_steps
        limit = -(-requested // chunk_steps) * chunk_steps
        base = self._derive_rng(self.taco_variables, jax.random.PRNGKey(seed))
        all_rngs = jax.random.split(base, limit)

        if use_q:
            def decode_fn(carry, sr):
                carry, mel_c, _, _, active = self._decode_chunk_q(
                    self._dp_q, memory, pmem, *carry, sr, lengths
                )
                return carry, mel_c, active
        else:
            def decode_fn(carry, sr):
                carry, mel_c, _, _, active = self._decode_chunk(
                    self.taco_variables, memory, *carry, sr, lengths
                )
                return carry, mel_c, active

        yield from chunked_mel_stream(
            hp, (state, frame, finished), decode_fn,
            lambda win: self._postnet_window(self.taco_variables, win),
            requested, chunk_steps, all_rngs,
        )

    def synthesize_incremental(
        self,
        text: str,
        sigma: float = 0.666,
        seed: int = 0,
        chunk_steps: int = 64,
        max_steps: int | None = None,
        denoiser_strength: float = 0.0,
        speaker_id: int | None = None,
    ):
        """Stream ONE utterance's audio: yields float32 waveform chunks as
        soon as the decoded mel clears the vocoder's receptive field —
        first audio after ~``chunk_steps + overlap`` decoder steps instead
        of the whole ``max_decoder_steps`` scan (VERDICT r2 weak #5's
        first-audio-latency gap).

        The vocoder runs on fixed-width windows of the growing mel with
        ``receptive_overlap_frames`` of context each side and
        position-consistent noise (one draw per decoded chunk, windows
        slice the same stream), so emitted audio equals a single-pass
        vocode of the final mel with that noise to float tolerance; the
        final window is pinned to the utterance end like
        :func:`.models.chunked.infer_long`.  Window/noise bookkeeping
        lives in :func:`incremental_vocode_stream` (shared with the
        tensor-parallel synthesizer).

        ``denoiser_strength > 0`` streams bias-subtracted audio (the
        reference's ``-d`` knob, applied offline there): the windowed
        denoiser adds ``< n_fft`` samples (~46 ms) of latency and emits
        the offline-equal denoised stream
        (``models.denoiser.denoise_stream``)."""
        stream = self.text_to_mel_stream(
            text, chunk_steps=chunk_steps, seed=seed, max_steps=max_steps,
            speaker_id=speaker_id,
        )
        audio = incremental_vocode_stream(
            self.wg_cfg, stream,
            lambda mel, nz, sg: np.asarray(
                self._vocode_window(self._wg_serve_vars, mel, nz, sg)
            ),
            sigma, seed, chunk_steps,
            vocode_masked_fn=self._masked_vocode_handle(),
        )
        if denoiser_strength > 0:
            if self._denoise_bias is None:
                raise ValueError(
                    "denoiser_strength > 0 needs use_denoiser=True")
            from .models.denoiser import (cached_stream_denoiser,
                                          denoise_stream)

            den = cached_stream_denoiser(
                self, (self._denoise_params, chunk_steps),
                lambda: self._denoise_bias, self._denoise_params,
                chunk_steps, self.wg_cfg.upsample_stride)
            audio = denoise_stream(audio, den, denoiser_strength)
        yield from audio

    def synthesize_incremental_batch(
        self,
        texts,
        sigma: float = 0.666,
        seed: int = 0,
        chunk_steps: int = 64,
        max_steps: int | None = None,
        speaker_id=None,
    ):
        """Stream N utterances CONCURRENTLY: yields ``(row, chunk)`` pairs
        as each stream's decoded mel clears the vocoder's receptive field.
        One batched decode scan drives all rows in lockstep — decode is
        weight-streaming-bound (bench.py), so the batch rides the same
        36 MB/step stream nearly free and every concurrent stream sees
        ~single-stream first-audio latency; each emission round is one
        batched vocoder call on the stacked per-row windows.  A row whose
        gate fires early flushes immediately (it does not wait for the
        slowest row).  Per-row chunk concatenation equals a single-pass
        vocode of that row's final mel with its slice of the batch noise
        stream (:func:`incremental_vocode_stream_batch`)."""
        stream = self.text_to_mel_stream(
            texts, chunk_steps=chunk_steps, seed=seed, max_steps=max_steps,
            speaker_id=speaker_id,
        )
        yield from incremental_vocode_stream_batch(
            self.wg_cfg, stream,
            lambda mel, nz, sg: np.asarray(
                self._vocode_window(self._wg_serve_vars, mel, nz, sg)
            ),
            sigma, seed, chunk_steps,
            vocode_masked_fn=self._masked_vocode_handle(),
        )

    def _masked_vocode_handle(self):
        """Bound masked-length exact-pass handle for the streaming engine /
        server (None on fused/int8 chains — their kernels take a static
        n_valid).  Weights are read at call time, so checkpoint swaps take
        effect with zero recompiles like every other serving program."""
        if self._vocode_masked is None:
            return None
        return lambda mel, nz, sg, tl: np.asarray(
            self._vocode_masked(self._wg_serve_vars, mel, nz, sg, tl)
        )

    def synthesize_to_files(self, texts, paths, sample_rate=None, **kw):
        sr = sample_rate or self.wg_cfg.sampling_rate
        for wav, path in zip(self.synthesize(texts, **kw), paths):
            save_wav(wav, path, sr)


def load_synthesizer(
    hp: HParams,
    taco_ckpt_dir: str,
    wg_cfg: WaveGlowConfig,
    wg_ckpt_dir: str | None,
    use_denoiser: bool = True,
    num_speakers: int = 1,
) -> Synthesizer:
    """Restore both models from Orbax checkpoints and build a Synthesizer.

    ``wg_ckpt_dir=None`` leaves the vocoder at random init (for mel-only /
    Griffin-Lim use of :meth:`Synthesizer.text_to_mel`)."""
    import jax.numpy as jnp

    from .train.checkpoint import CheckpointManager
    from .train.state import TrainState, create_train_state

    # multi-speaker checkpoints (train.py with N data_paths builds
    # num_speakers=N) need the same table in the restore template
    taco = Tacotron2(hp, n_vocab=N_SYMBOLS, num_speakers=num_speakers)
    rng = jax.random.PRNGKey(0)
    tvars = jax.jit(taco.init)(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32),
        jnp.asarray([8]),
        jnp.zeros((1, hp.n_mel_channels, 8)),
        jnp.asarray([8]),
        # materialize the speaker table in the restore template (flax
        # creates params on use; the trainer always passes speaker ids)
        speaker_ids=(jnp.zeros((1,), jnp.int32)
                     if num_speakers > 1 else None),
    )
    tstate = create_train_state(hp, tvars)
    tstate, _ = CheckpointManager(taco_ckpt_dir).restore(tstate)

    wg = WaveGlow(wg_cfg)
    frames = wg_cfg.segment_length // wg_cfg.hop_length + 1
    wvars = jax.jit(wg.init)(
        rng,
        jnp.zeros((1, wg_cfg.n_mel_channels, frames)),
        jnp.zeros((1, wg_cfg.segment_length)),
    )
    import optax

    wstate = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=wvars["params"],
        batch_stats={},
        opt_state=optax.adam(wg_cfg.learning_rate).init(wvars["params"]),
        tx=optax.adam(wg_cfg.learning_rate),
    )
    if wg_ckpt_dir is not None:
        wstate, _ = CheckpointManager(wg_ckpt_dir).restore(wstate)

    return Synthesizer(
        hp=hp,
        taco=taco,
        taco_variables={
            "params": tstate.params,
            "batch_stats": tstate.batch_stats,
        },
        wg_cfg=wg_cfg,
        waveglow=wg,
        wg_variables={"params": wstate.params},
        use_denoiser=use_denoiser,
    )
