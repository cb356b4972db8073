"""LSTM primitives as fused matmul + ``lax.scan`` — the TPU replacement for
cuDNN's ``nn.LSTM`` / ``nn.LSTMCell`` (reference ``tacotron/tacotron.py:188-190,
241-252``; SURVEY.md §2.2 row 1).

Design: all four gates are one ``[B, in+hidden] @ [in+hidden, 4H]`` matmul per
step (MXU-shaped), recurrence via ``lax.scan``; the bidirectional encoder LSTM
is two scans with length-aware sequence reversal replacing
``pack_padded_sequence``.  Gate order is (i, f, g, o), matching torch, so
reference checkpoints can be converted weight-for-weight.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSTMCell(nn.Module):
    """Single-step LSTM cell, gates fused into one input and one recurrent
    matmul.  State is ``(h, c)``.  ``dtype`` sets the computation dtype
    (bf16 = MXU-native matmuls; params stay ``param_dtype``)."""

    features: int
    param_dtype: Any = jnp.float32
    dtype: Any = None

    @nn.compact
    def __call__(self, state, x):
        h, c = state
        H = self.features
        dense = nn.Dense(
            4 * H,
            use_bias=True,
            param_dtype=self.param_dtype,
            dtype=self.dtype,
            name="ih",
        )
        rdense = nn.Dense(
            4 * H,
            use_bias=True,
            param_dtype=self.param_dtype,
            dtype=self.dtype,
            name="hh",
        )
        gates = dense(x) + rdense(h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    @staticmethod
    def init_state(batch: int, features: int, dtype=jnp.float32):
        return (
            jnp.zeros((batch, features), dtype),
            jnp.zeros((batch, features), dtype),
        )


class UnidirectionalLSTM(nn.Module):
    """Run an LSTM over the time axis with ``lax.scan``.

    Input [B, T, D] -> output [B, T, H].
    """

    features: int
    param_dtype: Any = jnp.float32
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        B = xs.shape[0]
        cell = LSTMCell(
            self.features, param_dtype=self.param_dtype, dtype=self.dtype
        )
        scan = nn.scan(
            lambda c, carry, x: c(carry, x),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        state_dtype = self.dtype or xs.dtype
        init = LSTMCell.init_state(B, self.features, state_dtype)
        _, ys = scan(cell, init, xs)
        return ys


def reverse_padded(xs: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each sequence within its valid length, keeping padding at the
    tail — the semantics ``pack_padded_sequence`` gives a backward RNN.

    xs: [B, T, D], lengths: [B] -> [B, T, D]
    """
    T = xs.shape[1]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(xs, idx[:, :, None], axis=1)


class BiLSTM(nn.Module):
    """Bidirectional LSTM with masking-aware reversal.

    Input [B, T, D], lengths [B] -> [B, T, 2*features]; positions beyond each
    length are zeroed (like ``pad_packed_sequence``).
    """

    features: int
    param_dtype: Any = jnp.float32
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lengths: jnp.ndarray | None = None):
        fwd = UnidirectionalLSTM(
            self.features, param_dtype=self.param_dtype, dtype=self.dtype,
            name="fwd",
        )(xs)
        if lengths is None:
            rev_in = xs[:, ::-1]
            bwd = UnidirectionalLSTM(
                self.features, param_dtype=self.param_dtype, dtype=self.dtype,
                name="bwd",
            )(rev_in)[:, ::-1]
        else:
            rev_in = reverse_padded(xs, lengths)
            bwd_rev = UnidirectionalLSTM(
                self.features, param_dtype=self.param_dtype, dtype=self.dtype,
                name="bwd",
            )(rev_in)
            bwd = reverse_padded(bwd_rev, lengths)
        out = jnp.concatenate([fwd, bwd], axis=-1)
        if lengths is not None:
            mask = (jnp.arange(xs.shape[1])[None, :] < lengths[:, None])[..., None]
            out = jnp.where(mask, out, 0.0)
        return out
