"""Normalization primitives (NHWC / channels-last).

PixelwiseNormalization: reference multi_stylegan/equalized_layer.py:257-277.
MinibatchStdDev: reference multi_stylegan/u_net_2d_discriminator.py:189-217.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def pixel_norm(x: jax.Array, eps: float = 1e-8, axis: int = -1) -> jax.Array:
    """x / sqrt(mean(x^2, channel) + eps) (equalized_layer.py:276)."""
    ms = jnp.mean(jnp.square(x), axis=axis, keepdims=True)
    return x * lax.rsqrt(ms + eps)


def minibatch_std_dev(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Append the scalar mean of the per-position batch std as a channel.

    NHWC equivalent of u_net_2d_discriminator.py:205-217: std over the batch
    dim per (h, w, c), clamped at eps inside the sqrt, reduced to one scalar,
    broadcast and concatenated as an extra channel.

    Under a data-sharded mesh the batch mean/std become *global* (XLA inserts
    the cross-device reduction); the reference's nn.DataParallel computed
    them per device shard.  The global statistic is the mathematically
    intended one and is deterministic; divergence documented.
    """
    # batch statistics in f32: under bfloat16, tiny variances quantize to the
    # eps clamp where sqrt's second derivative explodes (R1's grad-of-grad
    # produced non-finite discriminator gradients).
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=0)
    std = jnp.sqrt(jnp.maximum(var, eps))
    stat = jnp.mean(std).astype(x.dtype)
    b, h, w, _ = x.shape
    feat = jnp.full((b, h, w, 1), stat, dtype=x.dtype)
    return jnp.concatenate([x, feat], axis=-1)
