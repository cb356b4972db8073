"""Test configuration.

Tests run on CPU with 8 virtual devices so the same pjit/shard_map collective
code paths the TPU runs are exercised without hardware (SURVEY.md §4.4) and so
fp32 golden comparisons are deterministic.  Must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; the config flag wins.
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"


def assert_one_program(jitted, n=1, what="this jitted function"):
    """Pin `jitted._cache_size() == n` with a pointed diagnosis.

    `_cache_size()` counts C++ pjit fastpath cache entries — but the
    fastpath only STORES entries when `jax.core.trace_state_clean()` is
    true (pjit.py `_run_python_pjit`): a tracer or axis env leaked onto
    the main thread by an EARLIER test makes every later jit call skip
    fastpath caching, so the pin reads 0 with perfectly correct numerics.
    Checking trace state first turns that order-dependent mystery flake
    into a named diagnosis (seen once in a r5 full-suite run:
    test_infer_masked_length_matches_exact read 0 == 1; isolation and
    every bisection subset passed)."""
    assert_trace_clean(what)
    got = jitted._cache_size()
    assert got == n, f"{what}: expected {n} compiled program(s), saw {got}"


def assert_trace_clean(what="a _cache_size() pin"):
    """Fail with a diagnosis if jax trace state is unclean (see above)."""
    from jax._src import core as _core

    assert _core.trace_state_clean(), (
        "jax trace state is UNCLEAN (tracer/axis-env leaked by an earlier "
        "test in this process): the C++ pjit fastpath never stores cache "
        "entries in this state, so _cache_size() undercounts regardless "
        f"of how many programs {what} compiled. Hunt the leaking test "
        "with an autouse trace_state_clean() teardown guard; do not "
        "blame this pin."
    )
