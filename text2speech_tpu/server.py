"""Continuous-batching streaming TTS server.

The reference synthesizes one request at a time (``inference.py:80-95``) and
has no serving layer.  This module is the TPU-native serving story built on
the measured decode bound (bench.py): autoregressive Tacotron decode is
WEIGHT-STREAMING-bound (~36 MB of decoder weights per step against HBM), so
extra rows in the batched decode scan are nearly free — idle rows waste no
meaningful chip time.  The server therefore keeps ONE fixed-shape B-slot
decode batch running at all times and admits queued sessions into freed
slots mid-flight (continuous batching, the same scheduling idea as modern
LLM serving engines, applied to TTS):

* **Static shapes everywhere** — one decode compile (``[B]`` rows x
  ``chunk_steps``), one postnet-window compile, two vocoder-window compiles
  (the steady-state ``chunk + 2*ov`` width and the first-window fast-path
  ``chunk + ov`` width), plus ONE masked-length exact-pass program covering
  every session shorter than a window (``vocode_masked_fn`` — the true
  length is a traced scalar, so distinct short lengths never recompile);
  admission writes a session's encoder memory / decoder carry into its slot
  row with a jitted ``dynamic_update_index_in_dim`` tree update (slot index
  is a traced argument, so admissions never retrace).
* **Session independence** — decode runs with PER-ROW dropout keys
  (``Tacotron2.decode_chunk`` per-row mode), so a session's mel stream
  depends only on its own ``(text, seed)``, never on which slot it landed
  in, when it joined, or who shares the batch.  Noise for the vocoder is a
  per-session block stream (``fold_in(session_key, block)``), position-
  consistent across windows: a session's concatenated audio equals a
  single-pass vocode of its final mel with its own noise to float
  tolerance — the same invariant the lockstep streaming engine pins
  (``infer.incremental_vocode_stream_batch``).
* **Per-slot frontiers** — unlike the lockstep engine (all rows share one
  decode clock), every slot carries its own decode/postnet/vocode
  frontiers, so sessions at different progress coexist in one batch.  A
  session's slot frees as soon as its audio is fully flushed (its valid
  frames cleared the postnet receptive field and the vocoder windows); the
  next queued request is admitted at the start of the following round.

Scheduling per ``step()`` round:

1. admit queued sessions into free slots (jitted row placement);
2. one batched ``decode_chunk`` of ``chunk_steps`` frames for ALL slots
   (per-row keys; free slots decode garbage — they ride the same streamed
   weights, which is the whole point);
3. postnet over fixed-width windows (``chunk + 2*prf`` frames) of each
   advancing slot, batched across slots into one call;
4. vocoder over fixed-width receptive-field windows (``chunk + 2*ov``
   frames) of each slot's postnet output with its own noise stream,
   batched across slots into one call; early-gate slots flush without
   waiting for anyone;
5. emit ``StreamEvent(sid, audio_chunk)`` per ready window and a final
   event when a session completes.

Window/edge rules (start pinning, true-length bounding, zero-fill ==
conv padding only) are the streaming engine's — see
``infer.incremental_vocode_stream_batch``'s docstring for the derivations.

Reference behavior served: ``tacotron/tacotron.py:431-466`` (decode loop)
+ ``inference.py:80-95`` (mel -> waveform), re-architected as a
multi-session scheduler.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np



def _speaker_row(speaker_id, num_speakers: int):
    """Per-request speaker id -> [1] int32 row for the encode endpoint
    (shared validation: ``models.tacotron_serve.speaker_ids_array``)."""
    from .models.tacotron_serve import speaker_ids_array

    return speaker_ids_array(speaker_id, 1, num_speakers)


@dataclass
class StreamEvent:
    """One server emission: an audio chunk for session ``sid``, or (with
    ``audio=None, final=True``) the session-complete marker."""

    sid: int
    audio: np.ndarray | None
    final: bool = False


@dataclass
class _Session:
    sid: int
    slot: int
    keys: np.ndarray            # [limit, 2] per-step decode keys
    noise_key: np.ndarray       # [2] uint32 (host copy: batched prefetch
                                # stacks keys without per-session dispatch)
    sigma: float = 0.666        # per-session flow temperature
    den_strength: float = 0.0   # per-session denoiser strength (0 = off)
    # decode-side frontiers
    t: int = 0                  # decoded frames
    out_len: int = 0            # active frames within the contract
    gate_fired: bool = False
    cap: int = 0                # min(t, requested): real decoded frames
    mel_final: bool = False
    # postnet-side
    mel_parts: list = field(default_factory=list)    # raw decode chunks
    post_parts: list = field(default_factory=list)   # postnet output
    emitted: int = 0            # postnet frames emitted
    # vocoder-side
    E: int = 0                  # frames vocoded+emitted
    flushed: bool = False
    noise_blocks: list = field(default_factory=list)  # per-comp np arrays
    noise_frames: int = 0
    # denoiser-side (active only when den_strength > 0: raw vocoder audio
    # buffers in a bounded DenoiseBuffer — emitted prefixes are trimmed —
    # and the denoise stage emits with < n_fft hold-back)
    den_buf: object = None
    den_emitted: int = 0
    # accounting
    admit_round: int = 0        # stats["rounds"] value when admitted
    first_emit_round: int | None = None
    emitted_samples: int = 0

    def mel_cat(self) -> np.ndarray:
        return (np.concatenate(self.mel_parts, axis=-1)
                if len(self.mel_parts) > 1 else self.mel_parts[0])

    def post_cat(self) -> np.ndarray:
        return (np.concatenate(self.post_parts, axis=-1)
                if len(self.post_parts) > 1 else self.post_parts[0])


class ContinuousBatcher:
    """Slot scheduler over injected device callables (pure scheduling here;
    :func:`make_server` wires it to a :class:`..infer.Synthesizer`).

    Callables (all shapes static):

    * ``admit_fn(request, seed) -> row_tree`` — per-session batch-row
      pytree (encoder memory row, length, zeroed decoder carry, ...);
    * ``validate_fn(request) -> canonical | None`` (optional) — raises on
      invalid requests at ``submit`` time; a non-None return replaces the
      request (e.g. pre-encoded text) before it reaches ``admit_fn``;
    * ``init_batch_fn() -> batch_tree`` — the B-slot batch pytree;
    * ``decode_fn(batch_tree, keys [chunk, B, 2]) ->
      (batch_tree, mel [B, n_mel, chunk], active [B, chunk],
      finished [B])``;
    * ``postnet_fn(wins [B, n_mel, chunk+2*prf]) -> residual`` (same
      shape; output mel = window + residual);
    * ``vocode_fn(mel [B, n_mel, W], noise_tuple, sigma) ->
      [B, W*gpf*n_group]`` with ``W = chunk + 2*ov``; the scheduler
      pre-scales each row's noise by its session's sigma and always
      passes ``sigma=1.0`` (sigma enters the flows only as
      ``sigma * noise``, so this is exact and keeps mixed-sigma rounds
      in ONE batched call);
    * ``key_fn(seed) -> np [limit, 2]`` per-session decode step keys;
    * ``draw_noise_fn(key) -> tuple of np [chunk*gpf, width]`` one
      noise block per flow component;
    * ``draw_noise_batch_fn(keys [B, 2], idx [B]) -> tuple of
      [B, chunk*gpf, width]`` (optional) — ``fold_in(keys[r], idx[r])``
      then one block per row, ALL rows in one device call.  When given,
      the scheduler prefetches every live session's next block per round
      in a single batched dispatch instead of one ``draw_noise_fn`` call
      per session (the per-session path stays as the fallback for flush
      tails and MUST produce identical values — same fold_in, same draw).
    """

    def __init__(self, *, slots: int, chunk_steps: int, requested: int,
                 prf: int, ov: int, n_mel: int, gpf: int, hop: int,
                 noise_widths: tuple[int, ...], sigma: float,
                 admit_fn, init_batch_fn, decode_fn, postnet_fn, vocode_fn,
                 key_fn, draw_noise_fn, vocode_exact_fn=None,
                 vocode_masked_fn=None,
                 draw_noise_batch_fn=None,
                 validate_fn=None, retain_sessions: bool = False,
                 denoiser=None):
        assert chunk_steps >= prf, (
            "chunk_steps must cover the postnet receptive field "
            f"({chunk_steps} < {prf}) so emission frontiers advance "
            "every round")
        self.slots = slots
        self.cs = chunk_steps
        self.requested = requested
        self.limit = -(-requested // chunk_steps) * chunk_steps
        self.prf = prf
        self.ov = ov
        self.n_mel = n_mel
        self.gpf = gpf
        self.hop = hop
        self.noise_widths = tuple(noise_widths)
        self.sigma = sigma
        self.Wp = chunk_steps + 2 * prf     # postnet window, frames
        self.Wv = chunk_steps + 2 * ov      # vocoder window, frames
        self.Wv1 = chunk_steps + ov         # first-window width (ws = 0)

        self._admit_fn = admit_fn
        self._decode_fn = decode_fn
        self._postnet_fn = postnet_fn
        self._vocode_fn = vocode_fn
        self._vocode_exact_fn = vocode_exact_fn or vocode_fn
        # optional masked-length exact pass (mel, noise, sigma, length):
        # ONE fixed-width program serves every session shorter than one
        # vocoder window (vs one exact-shape compile per distinct length,
        # minutes each over the tunnel, ON the scheduler thread)
        self._vocode_masked_fn = vocode_masked_fn
        # fused/int8 chains have no masked pass: each distinct short-session
        # length compiles its own exact program — warn once per length so
        # operators can attribute the scheduler stall (ADVICE r4)
        self._short_lengths_warned: set = set()
        self._key_fn = key_fn
        self._draw_noise_fn = draw_noise_fn
        self._draw_noise_batch_fn = draw_noise_batch_fn
        self._validate_fn = validate_fn
        # optional ..models.denoiser.StreamingDenoiser: sessions submitted
        # with denoiser_strength > 0 stream bias-subtracted audio (the
        # reference's per-synthesis denoiser, inference.py:75, served)
        self._denoiser = denoiser

        # slot index is a TRACED argument: admissions into any slot hit one
        # compile (CLAUDE.md gotcha: compiles on this rig take minutes)
        self._place = jax.jit(
            lambda tree, row, i: jax.tree.map(
                lambda a, b: jax.lax.dynamic_update_index_in_dim(
                    a, b, i, 0),
                tree, row,
            )
        )
        self._batch = init_batch_fn()
        self._queue: deque = deque()
        self._slots: list[_Session | None] = [None] * slots
        self._next_sid = 0
        self._retain = retain_sessions
        # completed sessions are dropped unless retain_sessions=True (their
        # mel/noise buffers are per-utterance-sized; a long-lived server
        # must not accumulate them) — tests retain to assert invariants
        self.sessions: dict[int, _Session] = {}
        self.stats = {"rounds": 0, "row_steps": 0, "active_row_steps": 0,
                      "postnet_calls": 0, "vocoder_calls": 0,
                      "denoiser_calls": 0,
                      "admitted": 0, "completed": 0, "cancelled": 0,
                      "first_audio_rounds_sum": 0, "emitted_samples": 0}

    # --- public API --------------------------------------------------------

    def submit(self, request, seed: int | None = None,
               sigma: float | None = None,
               denoiser_strength: float | None = None) -> int:
        """Queue a synthesis request; returns its session id.  ``seed``
        defaults to the session id; ``sigma`` (flow sampling temperature,
        the reference CLI's quality knob, ``inference.py:75``) defaults to
        the server's; ``denoiser_strength`` > 0 streams bias-subtracted
        audio (the reference's ``-d`` knob, ``waveglow/denoiser.py:35-40``)
        equal to the offline denoiser over the session's raw audio — a
        session's output is a function of ``(request, seed, sigma,
        denoiser_strength)`` only.  EVERY invalid input (overlong text,
        malformed seed/sigma/strength) raises HERE, at submission — never
        inside :meth:`step`, which must stay up for other sessions.  If
        ``validate_fn`` returns non-None, that canonical form (e.g. the
        encoded text) is what ``admit_fn`` later receives — validation
        work is not redone at admission."""
        if seed is not None:
            if isinstance(seed, bool) or not isinstance(
                    seed, (int, np.integer)):
                raise ValueError(f"seed must be an int, got {type(seed)}")
            if not 0 <= seed < 2**31 - 1:
                raise ValueError(f"seed out of range [0, 2**31-1): {seed}")
            seed = int(seed)
        if sigma is not None:
            if isinstance(sigma, bool) or not isinstance(
                    sigma, (int, float, np.floating, np.integer)):
                raise ValueError(f"sigma must be a number, got {type(sigma)}")
            sigma = float(sigma)
            if not np.isfinite(sigma) or sigma < 0:
                raise ValueError(f"sigma must be finite and >= 0: {sigma}")
        if denoiser_strength is not None:
            if isinstance(denoiser_strength, bool) or not isinstance(
                    denoiser_strength, (int, float, np.floating, np.integer)):
                raise ValueError("denoiser_strength must be a number, got "
                                 f"{type(denoiser_strength)}")
            denoiser_strength = float(denoiser_strength)
            if not np.isfinite(denoiser_strength) or denoiser_strength < 0:
                raise ValueError("denoiser_strength must be finite and "
                                 f">= 0: {denoiser_strength}")
            if denoiser_strength > 0 and self._denoiser is None:
                raise ValueError(
                    "denoiser_strength > 0 but the server was built without "
                    "a denoiser (make_server over a Synthesizer with "
                    "use_denoiser=False)")
        if self._validate_fn is not None:
            canonical = self._validate_fn(request)
            if canonical is not None:
                request = canonical
        sid = self._next_sid
        self._next_sid += 1
        self._queue.append((sid, request, sid if seed is None else seed,
                            self.sigma if sigma is None else sigma,
                            denoiser_strength or 0.0))
        return sid

    def cancel(self, sid: int) -> bool:
        """Cancel a session: drop it from the queue, or free its slot
        immediately (the row decodes garbage until the next admission,
        which is ~free — decode is weight-streaming-bound).  Returns
        whether anything was cancelled; no further events are emitted for
        the session."""
        for item in self._queue:
            if item[0] == sid:
                self._queue.remove(item)
                self.stats["cancelled"] += 1
                return True
        for slot, s in enumerate(self._slots):
            if s is not None and s.sid == sid:
                self._slots[slot] = None
                if not self._retain:
                    self.sessions.pop(sid, None)
                self.stats["cancelled"] += 1
                return True
        return False

    @property
    def idle(self) -> bool:
        return not self._queue and all(s is None for s in self._slots)

    @property
    def active_count(self) -> int:
        return sum(s is not None for s in self._slots)

    def step(self) -> list[StreamEvent]:
        """One scheduling round: admit, decode one chunk for every slot,
        emit every audio window that became ready.  Returns the round's
        events (possibly empty during pipeline warmup)."""
        self._admit()
        live = [s for s in self._slots if s is not None]
        if not live:
            return []
        self.stats["rounds"] += 1
        self.stats["row_steps"] += self.slots * self.cs
        self.stats["active_row_steps"] += len(live) * self.cs

        # --- decode one chunk for all slots (per-row keys) ----------------
        keys = np.zeros((self.cs, self.slots, 2), np.uint32)
        for s in live:
            keys[:, s.slot] = s.keys[s.t : s.t + self.cs]
        self._batch, mel_c, active, finished = self._decode_fn(
            self._batch, jnp.asarray(keys))
        mel_c = np.asarray(mel_c, np.float32)
        active = np.asarray(active)
        finished = np.asarray(finished)

        post_tasks: list = []
        for s in live:
            r = s.slot
            s.mel_parts.append(mel_c[r])
            prev_t = s.t
            s.t += self.cs
            n_contract = max(0, min(self.cs, self.requested - prev_t))
            s.out_len += int(active[r, :n_contract].sum())
            s.gate_fired = bool(finished[r])
            s.cap = min(s.t, self.requested)
            if not s.mel_final:
                # all valid frames emittable once the decode frontier
                # covers the last valid frame's postnet context (or the
                # contract ends — context past `requested` is conv
                # zero-padding in the batch path too)
                ctx_end = min(s.out_len + self.prf, self.requested)
                s.mel_final = s.t >= self.limit or (
                    s.gate_fired and s.cap >= ctx_end)
            tl = min(s.out_len, self.requested)
            upto = (max(s.emitted, tl) if s.mel_final
                    else max(s.emitted, s.cap - self.prf))
            if upto > s.emitted:
                post_tasks.append((s, max(0, s.emitted - self.prf),
                                   s.emitted, upto))

        if post_tasks:
            self._run_postnet(post_tasks)

        # --- batched noise prefetch (one dispatch for every live session's
        # next block; the per-session draw stays as the flush fallback) ----
        if self._draw_noise_batch_fn is not None:
            need = [s for s in live if s.noise_frames < s.t]
            if need:
                nkeys = np.zeros((self.slots, 2), np.uint32)
                nidx = np.zeros((self.slots,), np.uint32)
                for s in need:
                    nkeys[s.slot] = s.noise_key
                    nidx[s.slot] = len(s.noise_blocks)
                blocks = [
                    np.asarray(c, np.float32)
                    for c in self._draw_noise_batch_fn(
                        jnp.asarray(nkeys), jnp.asarray(nidx))
                ]
                for s in need:
                    s.noise_blocks.append([c[s.slot] for c in blocks])
                    s.noise_frames += self.cs

        # --- vocoder windows over the advanced postnet frontiers ----------
        events: list[StreamEvent] = []
        voc_tasks: list = []
        shorts: list = []
        for s in live:
            if s.flushed:
                continue
            tl = min(s.out_len, s.emitted, self.requested)
            while not s.mel_final and tl >= s.E + self.cs + self.ov:
                voc_tasks.append((s, max(s.E - self.ov, 0), s.E,
                                  s.E + self.cs, tl))
                s.E += self.cs
            if s.mel_final:
                # postnet emitted >= tl by construction of `upto` above.
                # Any session shorter than one window flushes through the
                # EXACT-length pass, even after mid-stream emissions — a
                # fixed window would zero-fill [tl, Wv) in-tensor, which
                # is NOT conv padding for the flows and corrupts the last
                # ~ov frames (see the engine's derivation in infer.py)
                if tl <= self.Wv:
                    if tl > s.E:
                        shorts.append((s, s.E, tl))
                        s.E = tl
                else:
                    while s.E < tl:
                        kt = min(s.E + self.cs, tl)
                        ws = max(0, min(s.E - self.ov, tl - self.Wv))
                        voc_tasks.append((s, ws, s.E, kt, tl))
                        s.E = kt
                s.flushed = True

        for s, chunk in self._run_vocoder(voc_tasks):
            self._emit(events, s, chunk)
        for s, e0, tl in shorts:
            chunk = self._vocode_short(s, tl)[e0 * self.hop :]
            self._emit(events, s, chunk)

        # --- windowed denoise over buffered raw audio ----------------------
        self._run_denoise(live, events)

        # --- free completed slots ------------------------------------------
        for s in live:
            if s.flushed and s.mel_final:
                events.append(StreamEvent(s.sid, None, final=True))
                self.stats["completed"] += 1
                if s.first_emit_round is not None:
                    self.stats["first_audio_rounds_sum"] += (
                        s.first_emit_round - s.admit_round)
                self._slots[s.slot] = None
                if not self._retain:
                    self.sessions.pop(s.sid, None)
        return events

    def run(self, requests, seeds=None, sigmas=None,
            denoiser_strengths=None) -> dict[int, np.ndarray]:
        """Convenience driver: submit everything, step until idle, return
        ``{sid: concatenated audio}`` (streaming callers use :meth:`step`
        directly)."""
        sids = [self.submit(r, None if seeds is None else seeds[i],
                            None if sigmas is None else sigmas[i],
                            None if denoiser_strengths is None
                            else denoiser_strengths[i])
                for i, r in enumerate(requests)]
        parts: dict[int, list] = {sid: [] for sid in sids}
        while not self.idle:
            for ev in self.step():
                if ev.audio is not None:
                    parts[ev.sid].append(ev.audio)
        return {
            sid: (np.concatenate(chunks) if chunks
                  else np.zeros((0,), np.float32))
            for sid, chunks in parts.items()
        }

    # --- internals ----------------------------------------------------------

    def _emit(self, events, s: _Session, chunk):
        """Emit a raw vocoder chunk — or, for a denoising session, buffer
        it for the windowed denoise stage (which emits with < n_fft
        samples of hold-back, everything on flush)."""
        if s.den_strength > 0.0:
            if s.den_buf is None:
                from .models.denoiser import DenoiseBuffer

                s.den_buf = DenoiseBuffer(self._denoiser)
            s.den_buf.append(chunk)
            return
        events.append(StreamEvent(s.sid, chunk))
        self._account_emit(s, chunk)

    def _run_denoise(self, live, events):
        """Batched windowed denoise (``models.denoiser.denoise_windows``)
        advancing every denoising session's emit frontier as far as its
        buffered raw audio allows; per-row traced strengths keep
        mixed-strength rounds in ONE device call.  Emitted samples equal
        the offline ``make_denoiser`` denoise of the session's full raw
        audio to ~1-2 ulp (frame-local STFT/ISTFT — see the module
        docstring of ``models/denoiser.py``)."""
        den = self._denoiser
        if den is None:
            return
        tasks: list = []   # (session, window_samples, n_valid, e0, e1, f0)
        for s in live:
            if s.den_strength <= 0.0 or s.den_buf is None:
                continue
            for f0, nv, e0, e1 in den.plan(
                    s.den_buf.total, s.den_emitted, s.flushed):
                tasks.append(
                    (s, s.den_buf.window(f0, nv, s.flushed), nv, e0, e1, f0))
        if not tasks:
            return
        B = self.slots
        pad, dhop = den.pad, den.params.hop_length
        for g0 in range(0, len(tasks), B):
            group = tasks[g0 : g0 + B]
            rows = group + [group[0]] * (B - len(group))
            x = np.zeros((B, den.l_pad), np.float32)
            corr = np.ones((B, den.l_pad), np.float32)
            nval = np.zeros((B,), np.int32)
            stren = np.zeros((B,), np.float32)
            for j, (s, win, nv, _e0, _e1, _f0) in enumerate(rows):
                den.fill_row(x[j], corr[j], win, nv)
                nval[j] = nv
                stren[j] = s.den_strength
            out = den(x, stren, nval, corr)
            self.stats["denoiser_calls"] += 1
            for j, (s, _win, _nv, e0, e1, f0) in enumerate(group):
                chunk = out[j, e0 + pad - f0 * dhop : e1 + pad - f0 * dhop]
                s.den_emitted = e1
                s.den_buf.trim(e1)
                events.append(StreamEvent(s.sid, chunk.copy()))
                self._account_emit(s, chunk)

    def _account_emit(self, s: _Session, chunk):
        n = int(np.size(chunk))
        s.emitted_samples += n
        self.stats["emitted_samples"] += n
        if s.first_emit_round is None:
            # decode rounds from this session's admission to first audio
            # (x chunk_steps steps each): the per-session streaming-latency
            # ledger capacity planners read off stats
            s.first_emit_round = self.stats["rounds"]

    def _admit(self):
        for slot in range(self.slots):
            if self._slots[slot] is not None or not self._queue:
                continue
            sid, request, seed, sigma, den_strength = self._queue.popleft()
            row = self._admit_fn(request, seed)
            self._batch = self._place(self._batch, row, slot)
            s = _Session(
                sid=sid, slot=slot, keys=np.asarray(self._key_fn(seed)),
                noise_key=np.asarray(jax.random.fold_in(
                    jax.random.PRNGKey(seed + 1), 0x5EED)),
                sigma=sigma, den_strength=den_strength,
                admit_round=self.stats["rounds"],
            )
            self._slots[slot] = s
            self.sessions[sid] = s
            self.stats["admitted"] += 1

    def _run_postnet(self, tasks):
        """Batched postnet over fixed-width windows; window content is real
        decoded frames on ``[ws, min(ws+Wp, cap))`` and zero beyond —
        exactly the conv padding the full-sequence postnet sees (frames
        past ``cap`` either don't exist yet and are outside every emitted
        frame's receptive field, or are past ``requested`` where the batch
        path pads with zeros)."""
        B = self.slots
        for g0 in range(0, len(tasks), B):
            group = tasks[g0 : g0 + B]
            rows = group + [group[0]] * (B - len(group))
            wins = np.zeros((B, self.n_mel, self.Wp), np.float32)
            for j, (s, ws, _kf, _kt) in enumerate(rows):
                mel = s.mel_cat()
                e = min(ws + self.Wp, s.cap)
                wins[j, :, : e - ws] = mel[:, ws:e]
            res = np.asarray(self._postnet_fn(jnp.asarray(wins)),
                             np.float32)
            self.stats["postnet_calls"] += 1
            out = wins + res
            for j, (s, ws, kf, kt) in enumerate(group):
                s.post_parts.append(out[j, :, kf - ws : kt - ws])
                s.emitted = kt

    def _sess_noise(self, s: _Session, frames: int):
        """Session noise components covering ``frames`` mel frames,
        extended block-by-block (``fold_in(session_key, block)``) so any
        window slices the same position-consistent stream."""
        while s.noise_frames < frames:
            j = len(s.noise_blocks)
            block = self._draw_noise_fn(jax.random.fold_in(s.noise_key, j))
            s.noise_blocks.append([np.asarray(c, np.float32) for c in block])
            s.noise_frames += self.cs
        n_comp = len(self.noise_widths)
        return [
            np.concatenate([blk[c] for blk in s.noise_blocks], axis=0)
            for c in range(n_comp)
        ]

    def _run_vocoder(self, tasks):
        """Batched vocode over fixed receptive-field windows of each slot's
        postnet output with its own noise stream; same pinning rules as the
        lockstep engine (window real-fill bounded by the row's true length,
        start clamped to 0, flush windows pinned inside the utterance).

        First-window fast path (mirrors the lockstep engine): a round whose
        windows are ALL pinned at their session start (ws=0, kt <= chunk)
        runs at width ``Wv1 = chunk + ov`` — the trailing ``ov`` frames of
        the fixed ``Wv`` window are outside every emitted sample's
        receptive field, so dropping them cuts the first vocode round of a
        simultaneous admission wave ~38% at default shapes.  Mixed rounds
        (staggered joins sharing a round with mid-stream windows) stay at
        ``Wv`` so they still batch into the minimum number of calls."""
        if not tasks:
            return
        width = (self.Wv1
                 if all(t[1] == 0 and t[3] <= self.cs for t in tasks)
                 else self.Wv)
        # sigma enters the flows ONLY as sigma * noise (waveglow.py infer,
        # waveglow_fused.py likewise), so per-session sigma is applied by
        # pre-scaling each row's noise on the host (an identical IEEE f32
        # multiply) and passing sigma=1.0 — mixed-sigma rounds still batch
        # into ONE vocoder call
        B = self.slots
        for g0 in range(0, len(tasks), B):
            group = tasks[g0 : g0 + B]
            rows = group + [group[0]] * (B - len(group))
            wmel = np.zeros((B, self.n_mel, width), np.float32)
            wnoise = [
                np.zeros((B, width * self.gpf, w), np.float32)
                for w in self.noise_widths
            ]
            for j, (s, ws, _kf, _kt, fl) in enumerate(rows):
                lo, e = max(ws, 0), min(ws + width, fl)
                post = s.post_cat()
                wmel[j, :, lo - ws : e - ws] = post[:, lo:e]
                comps = self._sess_noise(s, e)
                sg = np.float32(s.sigma)
                for z, comp in zip(wnoise, comps):
                    z[j, (lo - ws) * self.gpf : (e - ws) * self.gpf] = (
                        sg * comp[lo * self.gpf : e * self.gpf])
            audio = np.asarray(self._vocode_fn(
                jnp.asarray(wmel),
                tuple(jnp.asarray(z) for z in wnoise), 1.0))
            self.stats["vocoder_calls"] += 1
            for j, (s, ws, kf, kt, _fl) in enumerate(group):
                yield s, audio[
                    j, (kf - ws) * self.hop : (kt - ws) * self.hop]

    def warm_window_widths(self) -> None:
        """Compile BOTH fixed vocoder window programs with throwaway
        full-batch calls: the ``Wv1`` first-window width (an all-starts
        admission wave) and the steady-state ``Wv`` width (any round with
        a mid-stream window).  A scheduler-session warmup whose text gates
        under ``2*chunk_steps + ov`` frames only ever runs ``Wv1`` rounds,
        leaving ``Wv`` to compile inside :meth:`step` on the first long
        real request (minutes over a cold TPU tunnel) — ADVICE r4."""
        for width in sorted({self.Wv1, self.Wv}):
            wmel = jnp.zeros((self.slots, self.n_mel, width), jnp.float32)
            nz = tuple(
                jnp.zeros((self.slots, width * self.gpf, w), jnp.float32)
                for w in self.noise_widths
            )
            np.asarray(self._vocode_fn(wmel, nz, 1.0))

    def warm_short_pass(self) -> None:
        """Compile the masked-length exact-pass program (if configured)
        with one throwaway call, so the first SHORT session (true length
        under one vocoder window) doesn't compile inside :meth:`step` on
        the scheduler thread.  The scheduler-session warmup can't reach
        this program unless its warmup text happens to gate early.

        On fused/int8 vocoder chains there is no masked pass (the Pallas
        kernels take a static valid length): this is a no-op, and short
        sessions compile one exact program per distinct length on the
        scheduler thread — :meth:`_vocode_short` warns per length."""
        if self._vocode_masked_fn is None:
            return
        wmel = jnp.zeros((1, self.n_mel, self.Wv), jnp.float32)
        nz = tuple(
            jnp.zeros((1, self.Wv * self.gpf, w), jnp.float32)
            for w in self.noise_widths
        )
        np.asarray(self._vocode_masked_fn(wmel, nz, 1.0, 1))

    def _vocode_short(self, s: _Session, tl: int) -> np.ndarray:
        """A session shorter than one window vocodes its exact length in
        one pass (zero-filling the window tail is NOT conv padding for the
        flows — zero noise positions produce bias-driven hidden values
        that would leak back into the valid frames; see the lockstep
        engine's derivation)."""
        post = s.post_cat()[:, :tl]
        comps = self._sess_noise(s, tl)
        sg = np.float32(s.sigma)     # same pre-scaling rule as _run_vocoder
        if self._vocode_masked_fn is None and tl not in self._short_lengths_warned:
            self._short_lengths_warned.add(tl)
            import sys as _sys
            print(
                f"[server] short session ({tl} frames) on a fused/int8 "
                "vocoder chain: no masked-length pass, so this length "
                "compiles its own exact program (first occurrence may "
                "stall the scheduler thread over a cold TPU cache)",
                file=_sys.stderr, flush=True)
        if self._vocode_masked_fn is not None:
            # masked-length pass: pad to the fixed Wv width, pass the true
            # length TRACED — one compiled program covers every short
            # session length (WaveGlow.infer(length=...); equivalence
            # pinned in tests/test_waveglow.py)
            wmel = np.zeros((1, self.n_mel, self.Wv), np.float32)
            wmel[0, :, :tl] = post
            nz = []
            for c, w in zip(comps, self.noise_widths):
                z = np.zeros((1, self.Wv * self.gpf, w), np.float32)
                z[0, : tl * self.gpf] = sg * c[: tl * self.gpf]
                nz.append(jnp.asarray(z))
            audio = np.asarray(self._vocode_masked_fn(
                jnp.asarray(wmel), tuple(nz), 1.0, tl))
            self.stats["vocoder_calls"] += 1
            return audio[0, : tl * self.hop]
        nz = tuple(
            jnp.asarray(sg * c[None, : tl * self.gpf]) for c in comps
        )
        audio = np.asarray(self._vocode_exact_fn(
            jnp.asarray(post[None]), nz, 1.0))
        self.stats["vocoder_calls"] += 1
        return audio[0, : tl * self.hop]


def make_server(synth, *, slots: int = 8, chunk_steps: int = 64,
                max_text_len: int = 256, max_steps: int | None = None,
                sigma: float = 0.666,
                retain_sessions: bool = False) -> ContinuousBatcher:
    """Build a :class:`ContinuousBatcher` over a
    :class:`..infer.Synthesizer`'s jitted handles (same decode / postnet /
    vocoder programs as the lockstep streaming path; honors the
    synthesizer's ``quantized_decode`` / fused / int8 vocoder settings).

    ``max_text_len`` is the static encoder width every session pads to
    (one compile); texts longer than it are rejected at ``submit`` time by
    the admit function."""
    from .models.chunked import (draw_noise, noise_schedule,
                                 receptive_overlap_frames)
    from .models.tacotron2 import DecoderState, Tacotron2
    from .text import encode_batch

    hp = synth.hp
    cfg = synth.wg_cfg
    requested = max_steps or hp.max_decoder_steps
    prf = (hp.postnet_kernel_size // 2) * hp.postnet_n_convolutions
    ov = receptive_overlap_frames(cfg)
    gpf = cfg.upsample_stride // cfg.n_group
    limit = -(-requested // chunk_steps) * chunk_steps

    from .models.tacotron_serve import int8_decode_worthwhile

    # measured-benefit precision selection: the server's decode batch IS
    # the slot count, so int8 decoder weights engage only when the batch is
    # big enough for the halved weight streaming to win (below it, the
    # bitwise-flax bf16 path serves — int8=True must never decode slower)
    quantized = synth.quantized_decode and int8_decode_worthwhile(slots)
    # weights are read from `synth` at CALL time (params are jit arguments
    # throughout, so a checkpoint swap — Synthesizer.load_weights — takes
    # effect on the next round with ZERO recompiles; in-flight sessions see
    # the new weights mid-utterance, so drain first if that matters)

    # probe the compute dtype once (matches text_to_mel_stream's state init)
    probe_ids = jnp.zeros((1, max_text_len), jnp.int32)
    probe_mem = synth._encode_mem(synth.taco_variables, probe_ids,
                                  jnp.asarray([1]))
    dt = probe_mem.dtype
    enc_dim = probe_mem.shape[-1]

    def zero_state(B):
        z = lambda d: jnp.zeros((B, d), dt)
        return DecoderState(
            z(hp.attention_rnn_dim), z(hp.attention_rnn_dim),
            z(hp.decoder_rnn_dim), z(hp.decoder_rnn_dim),
            jnp.zeros((B, max_text_len), dt),
            jnp.zeros((B, max_text_len), dt),
            z(hp.enc_conv_channels),
        )

    def init_batch_fn():
        tree = {
            "memory": jnp.zeros((slots, max_text_len, enc_dim), dt),
            "lengths": jnp.ones((slots,), jnp.int32),
            "state": zero_state(slots),
            "frame": jnp.zeros((slots, hp.n_mel_channels), dt),
            "finished": jnp.zeros((slots,), bool),
        }
        if quantized:
            pm = synth._pmem_fn(synth.taco_variables, tree["memory"])
            tree["pmem"] = pm
        return tree

    def validate_fn(request):
        # a request is a text, or (text, speaker_id) on multi-speaker
        # models (the reference's inference.py:51-87 voice selection)
        text, speaker = (request if isinstance(request, tuple)
                         else (request, None))
        ids_np, lens_np = encode_batch([text])
        if ids_np.shape[1] > max_text_len:
            raise ValueError(
                f"text encodes to {ids_np.shape[1]} symbols > server "
                f"max_text_len={max_text_len}")
        sid = _speaker_row(speaker, synth.taco.num_speakers)
        return ids_np, lens_np, sid   # canonical: encode once at submit

    def admit_fn(request, seed):
        ids_np, lens_np, sid = request
        ids = np.zeros((1, max_text_len), np.int32)
        ids[:, : ids_np.shape[1]] = ids_np
        mem = synth._encode_mem(
            synth.taco_variables, jnp.asarray(ids), jnp.asarray(lens_np),
            None if sid is None else jnp.asarray(sid))
        row = {
            "memory": mem[0],
            "lengths": jnp.asarray(int(lens_np[0]), jnp.int32),
            "state": jax.tree.map(lambda a: a[0], zero_state(1)),
            "frame": jnp.zeros((hp.n_mel_channels,), dt),
            "finished": jnp.asarray(False),
        }
        if quantized:
            row["pmem"] = synth._pmem_fn(synth.taco_variables, mem)[0]
        return row

    if quantized:
        def decode_fn(tree, keys):
            carry, mel_c, _, _, active = synth._decode_chunk_q(
                synth._dp_q, tree["memory"], tree["pmem"],
                tree["state"], tree["frame"], tree["finished"],
                keys, tree["lengths"])
            new = dict(tree)
            new["state"], new["frame"], new["finished"] = carry
            return new, mel_c, active, carry[2]
    else:
        def decode_fn(tree, keys):
            carry, mel_c, _, _, active = synth._decode_chunk(
                synth.taco_variables, tree["memory"], tree["state"],
                tree["frame"],
                tree["finished"], keys, tree["lengths"])
            new = dict(tree)
            new["state"], new["frame"], new["finished"] = carry
            return new, mel_c, active, carry[2]

    def key_fn(seed):
        base = synth._derive_rng(synth.taco_variables,
                                 jax.random.PRNGKey(seed))
        return np.asarray(jax.random.split(base, limit))

    denoiser = None
    if getattr(synth, "_denoise_bias", None) is not None:
        from .models.denoiser import serving_denoiser

        # the bias is read through the synthesizer per call, so /reload
        # (load_weights) swaps it with zero recompiles
        denoiser = serving_denoiser(
            lambda: synth._denoise_bias, synth._denoise_params,
            chunk_steps, cfg.upsample_stride)

    def draw_noise_fn(key):
        block = draw_noise(cfg, key, 1, chunk_steps * gpf)
        return tuple(np.asarray(c[0]) for c in block)

    def _one_block(k, j):
        blk = draw_noise(cfg, jax.random.fold_in(k, j), 1,
                         chunk_steps * gpf)
        return tuple(c[0] for c in blk)

    # all live sessions' next blocks in ONE dispatch (vmap over keys is
    # bitwise the per-key draw — pinned by
    # tests/test_server.py::test_server_batched_noise_prefetch_exact)
    draw_noise_batch_fn = jax.jit(jax.vmap(_one_block))

    return ContinuousBatcher(
        slots=slots, chunk_steps=chunk_steps, requested=requested,
        prf=prf, ov=ov, n_mel=hp.n_mel_channels, gpf=gpf,
        hop=cfg.upsample_stride,
        noise_widths=tuple(noise_schedule(cfg)), sigma=sigma,
        admit_fn=admit_fn, init_batch_fn=init_batch_fn,
        decode_fn=decode_fn,
        postnet_fn=lambda wins: synth._postnet_window(
            synth.taco_variables, wins),
        vocode_fn=lambda mel, nz, sg: synth._vocode_window(
            synth._wg_serve_vars, mel, nz, sg),
        vocode_masked_fn=synth._masked_vocode_handle(),
        key_fn=key_fn, draw_noise_fn=draw_noise_fn,
        draw_noise_batch_fn=draw_noise_batch_fn,
        validate_fn=validate_fn, retain_sessions=retain_sessions,
        denoiser=denoiser,
    )


def make_server_tp(tps, *, slots: int = 8, chunk_steps: int = 64,
                   max_text_len: int = 256, max_steps: int | None = None,
                   sigma: float = 0.666,
                   retain_sessions: bool = False,
                   use_denoiser: bool = False,
                   denoiser_kwargs: dict | None = None) -> ContinuousBatcher:
    """Continuous batching over a ``parallel.serve.TPSynthesizer``: the same
    scheduler, with every per-round device call mesh-split — the decode
    chunk through the column-sharded ``TPTacotronDecoder`` (per-row step
    keys ride ``P(None, 'data')``, so even under a data x model mesh each
    row's dropout stream derives only from its own key) and the window
    vocodes through ``TPWaveGlowServer``'s fused per-device kernels.  A
    session's audio matches the single-device server for the same
    ``(text, seed)`` to fp tolerance (``tests/test_server.py``)."""
    from .models.chunked import (draw_noise, noise_schedule,
                                 receptive_overlap_frames)
    from .text import encode_batch

    hp = tps.hp
    cfg = tps.wg_cfg
    requested = max_steps or hp.max_decoder_steps
    prf = (hp.postnet_kernel_size // 2) * hp.postnet_n_convolutions
    ov = receptive_overlap_frames(cfg)
    gpf = cfg.upsample_stride // cfg.n_group
    limit = -(-requested // chunk_steps) * chunk_steps

    decoder, vocoder = tps._endpoints(slots)
    _, vocoder1 = tps._endpoints(1)     # exact-length short utterances

    probe_ids = jnp.zeros((1, max_text_len), jnp.int32)
    probe_mem = tps._encode(tps._taco_vars, probe_ids, jnp.asarray([1]))
    dt = probe_mem.dtype
    enc_dim = probe_mem.shape[-1]

    def init_batch_fn():
        memory = jnp.zeros((slots, max_text_len, enc_dim), dt)
        return {
            "memory": memory,
            "pmem": tps._pmem(tps._taco_vars, memory),
            "lengths": jnp.ones((slots,), jnp.int32),
            "state": decoder.initial_state(memory),
            "frame": jnp.zeros((slots, hp.n_mel_channels), jnp.float32),
            "finished": jnp.zeros((slots,), bool),
        }

    def validate_fn(request):
        text, speaker = (request if isinstance(request, tuple)
                         else (request, None))
        ids_np, lens_np = encode_batch([text])
        if ids_np.shape[1] > max_text_len:
            raise ValueError(
                f"text encodes to {ids_np.shape[1]} symbols > server "
                f"max_text_len={max_text_len}")
        sid = _speaker_row(speaker, tps.taco.num_speakers)
        return ids_np, lens_np, sid   # canonical: encode once at submit

    def admit_fn(request, seed):
        ids_np, lens_np, sid = request
        ids = np.zeros((1, max_text_len), np.int32)
        ids[:, : ids_np.shape[1]] = ids_np
        mem = tps._encode(
            tps._taco_vars, jnp.asarray(ids), jnp.asarray(lens_np),
            None if sid is None else jnp.asarray(sid))
        return {
            "memory": mem[0],
            "pmem": tps._pmem(tps._taco_vars, mem)[0],
            "lengths": jnp.asarray(int(lens_np[0]), jnp.int32),
            "state": jax.tree.map(lambda a: a[0], decoder.initial_state(mem)),
            "frame": jnp.zeros((hp.n_mel_channels,), jnp.float32),
            "finished": jnp.asarray(False),
        }

    def decode_fn(tree, keys):
        carry, mel_c, _, _, active = decoder(
            tree["memory"], tree["pmem"], tree["state"], tree["frame"],
            tree["finished"], keys, tree["lengths"])
        new = dict(tree)
        new["state"], new["frame"], new["finished"] = carry
        return new, mel_c, active, carry[2]

    def key_fn(seed):
        base = tps._derive_rng(tps._taco_vars, jax.random.PRNGKey(seed))
        return np.asarray(jax.random.split(base, limit))

    denoiser = None
    if use_denoiser:
        from .models.denoiser import denoiser_stft_params, serving_denoiser

        kw = denoiser_kwargs or {}
        # per-config bias cache on the TPSynthesizer: the streaming path
        # may use a DIFFERENT config concurrently, and a future live-swap
        # path only has to update the dict entries
        bkey = tps.denoise_bias(kw)
        denoiser = serving_denoiser(
            lambda: tps._denoise_biases[bkey], denoiser_stft_params(**kw),
            chunk_steps, cfg.upsample_stride)

    def draw_noise_fn(key):
        block = draw_noise(cfg, key, 1, chunk_steps * gpf)
        return tuple(np.asarray(c[0]) for c in block)

    def _one_block(k, j):
        blk = draw_noise(cfg, jax.random.fold_in(k, j), 1,
                         chunk_steps * gpf)
        return tuple(c[0] for c in blk)

    draw_noise_batch_fn = jax.jit(jax.vmap(_one_block))

    return ContinuousBatcher(
        slots=slots, chunk_steps=chunk_steps, requested=requested,
        prf=prf, ov=ov, n_mel=hp.n_mel_channels, gpf=gpf,
        hop=cfg.upsample_stride,
        noise_widths=tuple(noise_schedule(cfg)), sigma=sigma,
        admit_fn=admit_fn, init_batch_fn=init_batch_fn,
        decode_fn=decode_fn,
        postnet_fn=lambda wins: tps._postnet(tps._taco_vars, wins),
        vocode_fn=lambda mel, nz, sg: vocoder(mel, None, sg, noise=nz),
        vocode_exact_fn=lambda mel, nz, sg: vocoder1(
            mel, None, sg, noise=nz),
        key_fn=key_fn, draw_noise_fn=draw_noise_fn,
        draw_noise_batch_fn=draw_noise_batch_fn,
        validate_fn=validate_fn, retain_sessions=retain_sessions,
        denoiser=denoiser,
    )
