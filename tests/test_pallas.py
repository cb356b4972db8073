"""Pallas kernel tests: interpret-mode parity of the fused gated activation
(forward + VJP) against the jnp reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text2speech_tpu.ops.pallas import gated


def test_gated_reference_math():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 8, 512).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 8, 512).astype(np.float32))
    out = np.asarray(gated.gated_activation_reference(a, b))
    x = np.asarray(a) + np.asarray(b)
    want = np.tanh(x[..., :256]) * (1 / (1 + np.exp(-x[..., 256:])))
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_gated_pallas_interpret_matches_reference(monkeypatch):
    from jax.experimental import pallas as pl

    # run the pallas kernels in interpreter mode on CPU
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(2, 300, 512).astype(np.float32))  # T % BLOCK_T != 0
    b = jnp.asarray(rng.randn(2, 300, 512).astype(np.float32))
    out = np.asarray(gated.gated_activation_pallas(a, b))
    want = np.asarray(gated.gated_activation_reference(a, b))
    np.testing.assert_allclose(out, want, atol=1e-6)

    # VJP parity
    g = jnp.ones_like(out)
    da_p, db_p = jax.vjp(gated.gated_activation_pallas, a, b)[1](jnp.asarray(g))
    da_r, db_r = jax.vjp(gated.gated_activation_reference, a, b)[1](jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(da_p), np.asarray(da_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_r), atol=1e-5)
