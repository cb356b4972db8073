"""Weight-quantized Tacotron decode — the serving path for the measured
weight-streaming bound.

Autoregressive decode streams ~36 MB of bf16 decoder weights per step
against this chip's measured 779 GB/s HBM read bandwidth (see bench.py
``bench_tacotron``); the weights don't fit VMEM, so no kernel fusion can
beat that floor — but **int8 weight storage halves it** (microbenchmark:
1.66x on the two LSTM matmuls).  This module provides

* :func:`extract_decoder_params` — the decoder's weights as a plain dict
  (folded out of the flax tree);
* :func:`quantize_decoder_params` — per-output-channel symmetric int8 for
  the large matmul kernels (the two fused-gate LSTM kernels dominate);
* :func:`decode_chunk_serve` — a functional mirror of
  ``Tacotron2.decode_chunk`` (same carry, same per-step dropout-key
  consumption, bitwise-equal in fp) whose quantized kernels run TRUE
  int8 x int8 MXU dots (:func:`_qdot`): activations are row-quantized on
  the fly and the weight bytes stream int8 all the way into the matmul.
  Dequantize-then-bf16-dot is a measured LOSS (~0.9x bf16): XLA
  materializes the dequantized kernel in HBM every step (see `_qdot`).

Reference behavior served: ``tacotron/tacotron.py:355-393`` (decoder step)
+ ``:431-466`` (inference loop).  The reference has no quantized path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import HParams
from .tacotron2 import DecoderState

# quantize 2-D kernels at least this many elements (the two LSTM ih/hh
# pairs at full size; small projections stay exact)
QUANT_MIN_ELEMS = 1 << 20

# Measured int8-decode crossover (bench.py bench_tacotron_int8,
# docs/KERNELS.md appendix): at small serving batches XLA VMEM-pins the
# bf16 baseline's loop-invariant LSTM kernels, so int8's activation-quant
# overhead makes it a wash-to-loss (driver record r3: 0.94x @ b16), while
# the halved weight-streaming bytes win from ~b32 up.  Serving paths call
# :func:`int8_decode_worthwhile` so a user flipping int8 on NEVER gets a
# slower decode — below the threshold the (bitwise-flax) bf16 path serves.
INT8_DECODE_MIN_BATCH = 32


def int8_decode_worthwhile(batch: int) -> bool:
    """Whether int8 decoder weights beat bf16 at this decode batch size
    (the activation quantization also adds recurrent-path noise, so int8
    must pay measurable throughput to be worth serving).

    Documented consequence: with ``quantized_decode=True`` /
    ``int8=True``, the same (text, seed) decodes in bf16 below the
    crossover and int8 at/above it, so outputs differ NUMERICALLY across
    batch sizes (e.g. a solo stream vs a 32-row batch).  Within one
    server this never varies — the decode batch is the fixed slot count —
    so the per-session reproducibility contract (output is a function of
    the request tuple) holds; it is only cross-entry-point determinism
    that quantized synthesizers trade for the policy.  Callers that need
    batch-size-independent numerics should leave quantization off."""
    return batch >= INT8_DECODE_MIN_BATCH


def speaker_ids_array(speaker_id, batch: int, num_speakers: int):
    """Normalize/validate the voice-selection knob for every serving
    surface (Synthesizer, TPSynthesizer, the server's request
    canonicalization): None (single-speaker / unconditioned), an int
    (every row), or a length-``batch`` sequence -> np [batch] int32 or
    None.  Raises ValueError on anything else — validation lives ONCE."""
    import numpy as np

    if speaker_id is None:
        return None
    if isinstance(speaker_id, bool):
        raise ValueError("speaker_id must be an int, got bool")
    # only INTEGRAL scalars broadcast; a float like 2.7 must not silently
    # truncate to speaker 2 (np.full would cast) — let it fall through to
    # the asarray branch, where the dtype-kind check rejects it
    ids = (np.full((batch,), speaker_id, np.int32)
           if isinstance(speaker_id, (int, np.integer))
           else np.asarray(speaker_id))
    if ids.dtype.kind not in "iu" or ids.shape != (batch,):
        raise ValueError(f"speaker_id must be an int or length-{batch} "
                         f"int sequence, got {speaker_id!r}")
    ids = ids.astype(np.int32)
    if num_speakers <= 1:
        raise ValueError("speaker_id given but the model is single-speaker "
                         "(build/load with num_speakers > 1)")
    if ids.min() < 0 or ids.max() >= num_speakers:
        raise ValueError(
            f"speaker_id out of range [0, {num_speakers}): {ids}")
    return ids


def replicated_endpoints(taco):
    """The four tiny replicated jits every serving path needs around the
    decode loop — encoder, memory projection, dropout-rng derivation,
    postnet residual.  Built HERE once so ``infer.Synthesizer`` and
    ``parallel.serve.TPSynthesizer`` share one definition (params stay
    jit arguments: checkpoint swaps never recompile).  Returns
    ``(encode, pmem, derive_rng, postnet)``."""
    from .tacotron2 import Tacotron2

    # speaker_ids=None compiles the single-speaker program; passing [B]
    # ids compiles the conditioned one (conditioning happens HERE, on the
    # encoder memory, so every downstream decode path inherits it)
    encode = jax.jit(lambda v, ids, le, sid=None: taco.apply(
        v, ids, speaker_ids=sid, text_lengths=le, method=Tacotron2.encode))
    pmem = jax.jit(lambda v, mem: taco.apply(
        v, mem,
        method=lambda m, mm: m.decoder.attention.process_memory(mm)))
    derive_rng = jax.jit(lambda v, r: taco.apply(
        v, method=Tacotron2.derive_rng, rngs={"dropout": r}))
    postnet = jax.jit(lambda v, mel: taco.apply(
        v, mel, method=Tacotron2.postnet_residual))
    return encode, pmem, derive_rng, postnet


def extract_decoder_params(variables: dict, hp: HParams) -> dict:
    """Flatten the decoder's flax params into a plain serving dict."""
    dec = variables["params"]["decoder"]
    att = dec["attention"]
    return {
        "prenet_fc0": dec["prenet"]["fc0"]["kernel"],
        "prenet_fc1": dec["prenet"]["fc1"]["kernel"],
        "att_ih_w": dec["attention_rnn"]["ih"]["kernel"],
        "att_ih_b": dec["attention_rnn"]["ih"]["bias"],
        "att_hh_w": dec["attention_rnn"]["hh"]["kernel"],
        "att_hh_b": dec["attention_rnn"]["hh"]["bias"],
        "dec_ih_w": dec["decoder_rnn"]["ih"]["kernel"],
        "dec_ih_b": dec["decoder_rnn"]["ih"]["bias"],
        "dec_hh_w": dec["decoder_rnn"]["hh"]["kernel"],
        "dec_hh_b": dec["decoder_rnn"]["hh"]["bias"],
        "query_w": att["query"]["kernel"],
        "v_w": att["v"]["kernel"],
        "loc_conv_w": att["loc_conv"]["Conv_0"]["kernel"],
        "loc_dense_w": att["loc_dense"]["kernel"],
        "mel_w": dec["mel_proj"]["kernel"],
        "mel_b": dec["mel_proj"]["bias"],
        "gate_w": dec["gate_proj"]["kernel"],
        "gate_b": dec["gate_proj"]["bias"],
    }


def quantize_kernel_int8(w: jnp.ndarray) -> dict:
    """Per-output-channel symmetric int8 for one 2-D kernel:
    ``w[:, j] ~= q[:, j] * s[j]``, s = max|w[:, j]| / 127.  Shared by the
    single-device path and the TP column slices
    (``parallel/tp_tacotron.shard_decoder_params``) — column slicing
    preserves each column's amax, so the two stay scale-identical by
    construction."""
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    # all-zero (dead/pruned) columns: 0/0 would be NaN — quantize
    # them to exact zeros with a unit scale
    s = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s.astype(jnp.float32)}


def quantize_decoder_params(dp: dict, min_elems: int | None = None) -> dict:
    """Per-output-channel symmetric int8 for large 2-D kernels
    (:func:`quantize_kernel_int8`); small projections stay exact.
    ``min_elems`` defaults to the module's ``QUANT_MIN_ELEMS`` at call
    time (tests shrink it to force quantization on tiny models)."""
    if min_elems is None:
        min_elems = QUANT_MIN_ELEMS
    return {
        k: (quantize_kernel_int8(w) if w.ndim == 2 and w.size >= min_elems
            else w)
        for k, w in dp.items()
    }


def _qdot(x, dp_entry, eps, dtype):
    """``x @ W`` for a possibly-quantized kernel.

    Quantized kernels run a TRUE int8 x int8 MXU dot: the activations are
    quantized per row on the fly (amax/127 — [B] rows, trivial VPU work)
    and the weight stays int8 all the way into the matmul, so the only
    per-step weight traffic is the int8 bytes.  Applying the per-row and
    per-output-column scales AFTER the int32 accumulate is exact up to
    rounding (both scales are separable from the contraction).

    The obvious-looking alternative — dequantize the kernel and run a bf16
    dot — MEASURES SLOWER THAN BF16 (~0.9x): XLA compiles the
    `q.astype(bf16) * s` producer as a standalone fusion that materializes
    the full bf16 kernel in HBM every decode step (read int8 + write bf16
    + read bf16 = 2.5x the bf16 path's traffic; verified in the compiled
    HLO).  ``eps`` is a carry-dependent zero folded into the scale so no
    weight-derived tensor is loop-invariant (hoisting the int8->bf16
    convert would re-materialize a full-width copy)."""
    if isinstance(dp_entry, dict):
        from ..ops.pallas.wn_block_int8 import rowquant_f32

        q, s = dp_entry["q"], dp_entry["s"]
        qx, sx = rowquant_f32(x.astype(jnp.float32))
        acc = jax.lax.dot_general(
            qx, q, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * sx * (s + eps)).astype(dtype)
    return jnp.dot(x, dp_entry.astype(dtype))


def lstm_cell_update(gates, c):
    """Gate split + sigmoid/tanh cell update shared by EVERY LSTM-cell
    variant (the fp/int8 serving cell above and the column-sharded TP
    cell in ``parallel/tp_tacotron.py``) — the round-3 bias-grouping fix
    was applied to one copy and missed the other; the body now lives
    once, and cell variants supply only the ``gates`` matmuls."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    return jax.nn.sigmoid(o) * jnp.tanh(c_new), c_new


def decode_chunk_serve(
    dp: dict,
    hp: HParams,
    memory: jnp.ndarray,            # [B, T_in, enc]
    processed_memory: jnp.ndarray,  # [B, T_in, attention_dim]
    state: DecoderState,
    frame: jnp.ndarray,             # [B, n_mel]
    finished: jnp.ndarray,          # [B] bool
    step_rngs: jnp.ndarray,         # [n_steps] PRNG keys
    text_lengths: jnp.ndarray | None = None,
    dtype: Any = jnp.float32,
    lstm_fn=None,
):
    """Functional twin of ``Tacotron2.decode_chunk`` over a serving param
    dict: same carry pytree, same dropout-key consumption per step, so the
    fp path is numerically the flax path; with
    :func:`quantize_decoder_params` weights, the big LSTM kernels stream
    int8 into int8 MXU dots (:func:`_qdot`).  Returns
    ``((state, frame, finished), mel [B, n_mel, n], gate, align, active)``.

    ``lstm_fn(kind, h, c, x, eps) -> (h_new, c_new)`` (kind in
    {"att", "dec"}) overrides the two LSTM cell evaluations — the
    tensor-parallel decoder (``parallel/tp_tacotron.py``) injects a
    column-sharded cell here (local gate slice + one all_gather) and
    reuses everything else in this body unchanged.  The carry's cell
    states then hold whatever per-device shape ``lstm_fn`` returns."""
    if lstm_fn is None:
        def lstm_fn(kind, h, c, x, eps):
            # fp kernels: the flax cell computes dense(x) + rdense(h),
            # i.e. (x@W_ih + b_ih) + (h@W_hh + b_hh) — keep EXACTLY that
            # grouping (fp addition is non-associative; a gate energy one
            # ulp from the threshold must not flip between the paths)
            pre = {"att": "att_", "dec": "dec_"}[kind]
            gates = (
                (_qdot(x, dp[pre + "ih_w"], eps, dtype)
                 + dp[pre + "ih_b"].astype(dtype))
                + (_qdot(h, dp[pre + "hh_w"], eps, dtype)
                   + dp[pre + "hh_b"].astype(dtype))
            )
            return lstm_cell_update(gates, c)
    B, T_in, _ = memory.shape
    mask = (
        (jnp.arange(T_in)[None, :] < text_lengths[:, None])
        if text_lengths is not None else None
    )
    mem = memory.astype(dtype)
    pmem = processed_memory.astype(dtype)
    loc_k = dp["loc_conv_w"].astype(dtype)       # [k, 2, n_filters]
    pad = (loc_k.shape[0] - 1) // 2

    def body(carry, rng_t):
        st, frame, finished = carry
        eps = jnp.sum(st.attention_h[0, :1]).astype(jnp.float32) * 0
        per_row = rng_t.ndim == 2        # [B, 2] per-row keys (see
        if per_row:                      # Tacotron2.decode_chunk docstring)
            splits = jax.vmap(jax.random.split)(rng_t)
            rng_pre, rng_step = splits[:, 0], splits[:, 1][0]
        else:
            rng_pre, rng_step = jax.random.split(rng_t)

        # prenet (dropout always on; key splits mirror Prenet.__call__)
        x = frame.astype(dtype)
        rng = rng_pre
        for name in ("prenet_fc0", "prenet_fc1"):
            x = jax.nn.relu(_qdot(x, dp[name], eps, dtype))
            if per_row:
                splits = jax.vmap(jax.random.split)(rng)
                rng, sub = splits[:, 0], splits[:, 1]
                keep = jax.vmap(
                    lambda k: jax.random.bernoulli(k, 0.5, x.shape[1:])
                )(sub)
            else:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0)

        # attention LSTM (the flax step's rng_att/rng_dec derive from
        # rng_step but are unused at eval, so fp parity is bitwise)
        del rng_step
        cell_in = jnp.concatenate([x, st.attention_context.astype(dtype)], -1)
        att_h, att_c = lstm_fn(
            "att", st.attention_h.astype(dtype),
            st.attention_c.astype(dtype), cell_in, eps,
        )

        # location attention
        wcat = jnp.stack(
            [st.attention_weights, st.attention_weights_cum], axis=-1
        ).astype(dtype)                                    # [B, T_in, 2]
        loc = jax.lax.conv_general_dilated(
            wcat, loc_k, (1,), [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        ploc = _qdot(loc, dp["loc_dense_w"], eps, dtype)
        pq = _qdot(att_h, dp["query_w"], eps, dtype)[:, None, :]
        energies = _qdot(
            jnp.tanh(pq + ploc + pmem), dp["v_w"], eps, dtype
        )[..., 0].astype(jnp.float32)
        if mask is not None:
            energies = jnp.where(mask, energies, -jnp.inf)
        weights = jax.nn.softmax(energies, axis=1).astype(dtype)
        context = jnp.einsum(
            "bt,bte->be", weights, mem, preferred_element_type=jnp.float32
        ).astype(dtype)
        weights_cum = st.attention_weights_cum + weights

        # decoder LSTM + projections
        dec_in = jnp.concatenate([att_h, context], -1)
        dec_h, dec_c = lstm_fn(
            "dec", st.decoder_h.astype(dtype), st.decoder_c.astype(dtype),
            dec_in, eps,
        )
        proj_in = jnp.concatenate([dec_h, context], -1)
        mel_frame = _qdot(proj_in, dp["mel_w"], eps, dtype) + dp[
            "mel_b"].astype(dtype)
        gate = (_qdot(proj_in, dp["gate_w"], eps, dtype)
                + dp["gate_b"].astype(dtype))[..., 0]

        stop_now = jax.nn.sigmoid(gate.astype(jnp.float32)) > hp.gate_threshold
        active = ~finished
        finished = finished | stop_now
        new_state = DecoderState(
            att_h, att_c, dec_h, dec_c, weights, weights_cum, context
        )
        return (new_state, mel_frame, finished), (mel_frame, gate, weights,
                                                  active)

    # carry dtype must be stable across iterations
    state = DecoderState(*(s.astype(dtype) for s in state))
    carry, (mel, gate, align, active) = jax.lax.scan(
        body, (state, frame.astype(dtype), finished), step_rngs
    )
    return (
        carry,
        mel.transpose(1, 2, 0).astype(jnp.float32),
        gate.transpose(1, 0).astype(jnp.float32),
        align.transpose(1, 0, 2).astype(jnp.float32),
        active.transpose(1, 0),
    )
