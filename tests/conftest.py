"""Test config: run everything on CPU with 8 virtual devices.

This fakes an 8-chip TPU slice on the host (SURVEY.md §4 item 4) so the
distributed tests exercise real mesh/sharding code paths without hardware.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (works for XLA:CPU too): the fast tier is
# dominated by recompiles of the same fused-train-step programs on a 1-core
# box (~30 of the ~55 min round-4 wall); a warm cache turns those into
# loads.  Opt out with MSG_TPU_NO_TEST_CACHE=1 (e.g. to time cold compiles).
if not os.environ.get("MSG_TPU_NO_TEST_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("MSG_TPU_TEST_CACHE", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
