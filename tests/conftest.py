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
