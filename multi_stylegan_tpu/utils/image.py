"""Batch image normalization helpers (reference multi_stylegan/misc.py:216-235)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_0_1_batch(x: jax.Array) -> jax.Array:
    """Per-sample min-max to [0, 1], clamped at 1e-3 (misc.py:216-225)."""
    flat = x.reshape(x.shape[0], -1)
    mn = jnp.min(flat, axis=1).reshape((-1,) + (1,) * (x.ndim - 1))
    mx = jnp.max(flat, axis=1).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.clip((x - mn) / (mx - mn), 1e-3, None)


def normalize_m1_1_batch(x: jax.Array) -> jax.Array:
    """2 * normalize_0_1_batch - 1 (misc.py:228-235)."""
    return 2.0 * normalize_0_1_batch(x) - 1.0
