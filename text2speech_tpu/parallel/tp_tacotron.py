"""Tensor-parallel Tacotron decode — splitting the weight-streaming floor.

Autoregressive decode is WEIGHT-STREAMING-bound, not compute-bound: every
step streams ~36 MB of bf16 decoder weights (the four LSTM matmul kernels
dominate) against ~779 GB/s HBM, a ~47 µs/step single-chip floor that no
kernel fusion can beat because the weights don't fit VMEM (bench.py
``bench_tacotron`` analysis).  Tensor parallelism is the one lever that
moves this floor for a SINGLE stream: shard the LSTM kernels over p chips
and each chip streams 36 MB / p per step.

Partitioning (Megatron-style, adapted to the recurrence):

* the four LSTM kernels (``att/dec x ih/hh``) are **column-parallel over
  hidden units, gate-consistently**: device i owns hidden units
  ``[i*H/p, (i+1)*H/p)`` of ALL FOUR gate blocks (i, f, g, o), so it
  computes its slice of the cell state and hidden state locally from the
  replicated cell input;
* one tiled ``all_gather`` per LSTM per step (2 per decode step, ~B*H
  elements — hundreds of KB riding ICI) rebuilds the full hidden state the
  next matmuls need; the cell state ``c`` never needs gathering — it stays
  device-local, appearing at the global level as a [B, H] array sharded
  ``P(..., 'model')`` through the scan carry;
* prenet, location attention, the mel/gate heads and the context einsum
  are replicated — together ~1 MB/step, negligible against the streamed
  LSTM weights.

The step body itself is NOT duplicated: :func:`~..models.tacotron_serve.
decode_chunk_serve` takes an ``lstm_fn`` hook, and this module injects the
column-sharded cell — fp numerics per hidden unit are identical to the
single-device path (same contraction per output column), asserted at 1e-5
in ``tests/test_tp_tacotron.py``.

Under a 2-D data x model mesh the batch rows decode independently, but the
always-on prenet dropout draws ``bernoulli(key, local_shape)`` — so a data
shard's dropout masks equal a single-device run over THAT shard, not the
row-slice of a full-batch run (same sampling distribution, different
draws; ``tests/test_tp_tacotron.py`` pins the per-shard equivalence).
PER-ROW step keys (``[n, B, 2]``; sharded ``P(None, 'data')`` so each
shard sees its own rows' keys) remove even that divergence: each row's
draws derive only from its own key, which is what the continuous-batching
server (``..server.make_server_tp``) runs on.

Composes with the int8 serving path: column slices keep per-output-channel
scales bit-identical to the single-device ``quantize_decoder_params``
scales (slicing columns doesn't change a column's amax), so int8 TP decode
streams 36 MB / (2p) per chip.

Expected latency arithmetic (v5e, reference size, from the measured
779 GB/s HBM and the measured 50.5 µs/step LSTM-only streaming scan):
bf16 TP over p=4 chips ⇒ ~9 MB/step/chip ≈ 12 µs + 2 all_gathers (~2 µs
ICI) ≈ 14 µs/step — ~3.4x faster first-audio than the 47 µs none-resident
single-chip floor (~2x vs the measured ~27 µs/step where XLA VMEM-pins
the invariant hh kernels; pinning composes WITH TP — each chip's slice is
smaller, so more of it fits).  Single-chip rig here, so the claim is
validated functionally (8-virtual-device CPU mesh) rather than timed.

Reference scaled: ``tacotron/tacotron.py:355-393`` (decoder step) +
``:431-466`` (inference loop); the reference decodes on one GPU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import HParams
from ..models.tacotron2 import DecoderState
from ..models.tacotron_serve import (_qdot, decode_chunk_serve,
                                     lstm_cell_update)
from .tp import MODEL_AXIS, _shard_map_norep

# the four column-sharded cells: (kernel key, bias key, hidden size attr)
_LSTM_KEYS = (
    ("att_ih_w", "att_ih_b", "attention_rnn_dim"),
    ("att_hh_w", "att_hh_b", "attention_rnn_dim"),
    ("dec_ih_w", "dec_ih_b", "decoder_rnn_dim"),
    ("dec_hh_w", "dec_hh_b", "decoder_rnn_dim"),
)


def _gate_cols(H: int, p: int, i: int) -> np.ndarray:
    """Columns of a [*, 4H] LSTM kernel owned by device i: hidden units
    [i*H/p, (i+1)*H/p) of each of the four gate blocks (i|f|g|o layout,
    matching ``jnp.split(gates, 4, axis=-1)``)."""
    s = H // p
    return np.concatenate(
        [np.arange(g * H + i * s, g * H + (i + 1) * s) for g in range(4)]
    )


def shard_decoder_params(dp: dict, hp: HParams, n_model: int,
                         int8: bool = False) -> dict:
    """Pre-split the four LSTM kernels/biases into gate-consistent
    column slices with a leading [n_model] device axis (place with
    ``P('model')``); every other serving weight stays replicated.

    ``int8``: quantize each device's kernel slice per output channel —
    the scales are identical to the single-device
    ``quantize_decoder_params`` scales because column slicing preserves
    each column's amax."""
    p = n_model
    out = dict(dp)
    for wk, bk, dim in _LSTM_KEYS:
        H = getattr(hp, dim)
        assert H % p == 0, (wk, H, p)
        w, b = dp[wk], dp[bk]
        ws = [jnp.take(w, _gate_cols(H, p, i), axis=-1) for i in range(p)]
        bs = [jnp.take(b, _gate_cols(H, p, i), axis=-1) for i in range(p)]
        if int8:
            from ..models.tacotron_serve import quantize_kernel_int8

            qd = [quantize_kernel_int8(wsl) for wsl in ws]
            out[wk] = {
                "q": jnp.stack([d["q"] for d in qd]),
                "s": jnp.stack([d["s"] for d in qd]),
            }
        else:
            out[wk] = jnp.stack(ws)
        out[bk] = jnp.stack(bs)
    return out


def _make_tp_lstm_fn(dp_local: dict, axis_name: str, dtype):
    """The column-sharded LSTM cell for ``decode_chunk_serve``'s hook:
    local gate slice (all four gates, this device's hidden units), local
    cell state, one tiled all_gather to rebuild the full hidden state."""

    def lstm_fn(kind, h, c, x, eps):
        pre = {"att": "att_", "dec": "dec_"}[kind]
        # EXPLICIT flax grouping (x@W + b_ih) + (h@W + b_hh), matching the
        # single-device cell bitwise per column slice — left-association
        # could flip a gate energy one ulp from the stop threshold between
        # the TP and single-device paths (r4 review finding)
        gates = (
            (_qdot(x, dp_local[pre + "ih_w"], eps, dtype)
             + dp_local[pre + "ih_b"].astype(dtype))
            + (_qdot(h, dp_local[pre + "hh_w"], eps, dtype)
               + dp_local[pre + "hh_b"].astype(dtype))
        )
        h_loc, c_new = lstm_cell_update(gates, c)
        h_new = jax.lax.all_gather(h_loc, axis_name, axis=-1, tiled=True)
        return h_new, c_new

    return lstm_fn


class TPTacotronDecoder:
    """Build-once tensor(+data)-parallel decode endpoint.

    Same global call signature and outputs as
    :func:`~..models.tacotron_serve.decode_chunk_serve` — the carry's cell
    states are full-shape [B, H] arrays that happen to live sharded
    ``P('model')`` on their channel axis, so a returned carry feeds the
    next chunk's call directly (streaming decode composes).  Weights are
    sharded + placed once at construction; repeated same-shape calls are
    re-trace-free (:meth:`cache_size`).
    """

    def __init__(
        self,
        variables_or_dp: dict,
        hp: HParams,
        mesh: Mesh,
        data_axis: str | None = "data",
        model_axis: str = MODEL_AXIS,
        int8: bool = False,
        dtype: Any = jnp.float32,
    ):
        from ..models.tacotron_serve import extract_decoder_params

        dp = (
            extract_decoder_params(variables_or_dp, hp)
            if "params" in variables_or_dp else variables_or_dp
        )
        self.hp = hp
        self.mesh = mesh
        self.model_axis = model_axis
        self.data_axis = data_axis if data_axis in mesh.axis_names else None
        n_model = mesh.shape[model_axis]

        # jitted for the same reason as TPWaveGlowServer's sharding: the
        # per-slice gather/quantize ops are eager tunnel round trips
        # otherwise (CLAUDE.md gotcha #5)
        dps = jax.jit(
            lambda d: shard_decoder_params(d, hp, n_model, int8=int8)
        )(dp)
        mp = P(model_axis)
        sharded_keys = {k for wk, bk, _ in _LSTM_KEYS for k in (wk, bk)}
        param_specs = {
            k: (jax.tree.map(lambda _: mp, v) if k in sharded_keys else
                jax.tree.map(lambda _: P(), v))
            for k, v in dps.items()
        }
        self._dps = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            dps, param_specs,
        )
        da = self.data_axis
        bspec = P(da) if da else P()
        cspec = P(da, model_axis) if da else P(None, model_axis)
        state_spec = DecoderState(
            attention_h=bspec, attention_c=cspec,
            decoder_h=bspec, decoder_c=cspec,
            attention_weights=bspec, attention_weights_cum=bspec,
            attention_context=bspec,
        )
        self._bspec = bspec
        self._state_spec = state_spec

        def run(dps, memory, pmem, state, frame, finished, rngs, lengths):
            dp_local = {
                k: (jax.tree.map(lambda x: x[0], v) if k in sharded_keys
                    else v)
                for k, v in dps.items()
            }
            return decode_chunk_serve(
                dp_local, hp, memory, pmem, state, frame, finished, rngs,
                text_lengths=lengths, dtype=dtype,
                lstm_fn=_make_tp_lstm_fn(dp_local, model_axis, dtype),
            )

        def build(rng_spec):
            return jax.jit(_shard_map_norep(
                run,
                mesh,
                in_specs=(param_specs, bspec, bspec, state_spec, bspec,
                          bspec, rng_spec, bspec),
                out_specs=((state_spec, bspec, bspec), bspec, bspec, bspec,
                           bspec),
            ))

        self._build = build
        self._fn = build(P())
        # per-row step keys ([n, B, 2]): the B axis must follow the batch
        # sharding so each shard's body sees keys for ITS rows only (built
        # lazily — only the continuous-batching server uses this mode)
        self._rowkey_spec = P(None, da) if da else P()
        self._fn_rowkeys = None

    def __call__(self, memory, processed_memory, state, frame, finished,
                 step_rngs, text_lengths=None):
        if text_lengths is None:
            text_lengths = jnp.full(
                (memory.shape[0],), memory.shape[1], jnp.int32
            )
        # commit every input to its mesh sharding (no-op for a carry that
        # is already placed) so repeated calls share ONE cache entry —
        # uncommitted host arrays and committed sharded arrays would
        # otherwise key different compilations
        bput = lambda x: jax.device_put(
            jnp.asarray(x), NamedSharding(self.mesh, self._bspec)
        )
        state = jax.tree.map(
            lambda x, s: jax.device_put(
                jnp.asarray(x), NamedSharding(self.mesh, s)
            ),
            state, self._state_spec,
        )
        step_rngs = jnp.asarray(step_rngs)
        if step_rngs.ndim == 3:          # per-row keys [n, B, 2]
            if self._fn_rowkeys is None:
                self._fn_rowkeys = self._build(self._rowkey_spec)
            fn = self._fn_rowkeys
            rng_sharding = NamedSharding(self.mesh, self._rowkey_spec)
        else:
            fn = self._fn
            rng_sharding = NamedSharding(self.mesh, P())
        return fn(
            self._dps, bput(memory), bput(processed_memory), state,
            bput(frame), bput(finished),
            jax.device_put(step_rngs, rng_sharding), bput(text_lengths),
        )

    def initial_state(self, memory: jnp.ndarray) -> DecoderState:
        """Full-shape zero carry (the jit's in_specs shard the cell
        states onto the mesh on first use)."""
        B, T_in, _ = memory.shape
        hp = self.hp
        z = lambda d: jnp.zeros((B, d), jnp.float32)
        return DecoderState(
            z(hp.attention_rnn_dim), z(hp.attention_rnn_dim),
            z(hp.decoder_rnn_dim), z(hp.decoder_rnn_dim),
            jnp.zeros((B, T_in), jnp.float32),
            jnp.zeros((B, T_in), jnp.float32),
            z(memory.shape[-1]),
        )

    def cache_size(self) -> int:
        """Compiled-program count across BOTH key modes (shared-key and
        per-row-keys) — the no-retrace assertions must see retraces in
        whichever mode the caller drives (the server uses per-row)."""
        n = self._fn._cache_size()
        if self._fn_rowkeys is not None:
            n += self._fn_rowkeys._cache_size()
        return n
