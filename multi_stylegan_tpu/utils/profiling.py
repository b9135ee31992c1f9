"""Profiling / tracing hooks (SURVEY.md §5: the reference has none; here
jax.profiler traces + per-step wall timing are first-class)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer that blocks on device results; returns ms."""

    def __init__(self) -> None:
        self.history = []

    @contextlib.contextmanager
    def measure(self, result_to_block_on=None):
        t0 = time.perf_counter()
        yield
        if result_to_block_on is not None:
            jax.block_until_ready(result_to_block_on)
        self.history.append((time.perf_counter() - t0) * 1e3)

    @property
    def last_ms(self) -> float:
        return self.history[-1]

    def summary(self) -> dict:
        import numpy as np

        h = np.asarray(self.history)
        return {
            "mean_ms": float(h.mean()),
            "p50_ms": float(np.percentile(h, 50)),
            "p90_ms": float(np.percentile(h, 90)),
            "n": len(h),
        }
