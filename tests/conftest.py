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

# Persistent compilation cache for the fast tier — OPT-IN ONLY
# (MSG_TPU_TEST_CACHE=<dir>): a warm cache cuts the heaviest equivalence
# test 329s -> 128s, but XLA:CPU AOT cache entries record host "machine
# features" that can mismatch across processes in this environment
# (cpu_aot_loader: "could lead to execution errors such as SIGILL"), and
# one such load hard-aborted the suite mid-test (round 5).  A flaky
# SIGABRT is worse than a slow suite; do not enable by default.
if os.environ.get("MSG_TPU_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["MSG_TPU_TEST_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
