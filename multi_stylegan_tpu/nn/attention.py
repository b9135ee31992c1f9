"""SAGAN-style non-local (self-attention) block, NHWC.

Reference: reference multi_stylegan/u_net_2d_discriminator.py:335-381.
theta/phi/g are 1x1 equalized convs; phi and g are 2x max-pooled; softmax
attention over spatial positions; learnable gamma (init 0) gates the
attention path; residual divided by sqrt(2).

The matmuls are expressed as einsums so XLA maps them straight onto the MXU
(the only attention in the system - 4096 x 1024 at the 64x64 placement).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multi_stylegan_tpu.nn.equalized import EqualizedConv2d


def _max_pool_2x(x: jax.Array) -> jax.Array:
    """2x max pooling via argmax + one-hot masked sum, NOT ``nn.max_pool``.

    Identical forward values (asserted in tests), torch-style first-max
    tie-break, and a LINEAR backward (broadcast multiply by the stopped-
    gradient mask - no gather, no scatter), so grad-of-grad is clean.
    ``nn.max_pool`` (reduce_window_max) produced NaN parameter gradients in
    the R1 second-order program on TPU at the flagship 256x256 config - the
    select-and-scatter derivative path under grad-of-grad was isolated as
    the trigger (round-2 stability run; all other attention pieces clean).
    R1 and path-length both differentiate through this block, so the
    second-order behavior is load-bearing (reference loss.py:310-317).

    Formulation set by measurement (tools/probe_nonlocal.py, real v5e,
    [16,64,64,384] bf16): the earlier ``take_along_axis`` gather ran at
    110 ms fwd / 110 ms bwd (XLA serializes the gather), the one-hot
    masked sum at 1.8 / 2.7 ms with bit-identical outputs."""
    b, h, w, c = x.shape
    pw = x.reshape(b, h // 2, 2, w // 2, 2, c)
    pw = pw.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, c, 4)
    idx = jnp.argmax(pw, axis=-1)
    mask = jax.nn.one_hot(idx, 4, dtype=pw.dtype)
    return jnp.sum(pw * mask, axis=-1)


class NonLocalBlock(nn.Module):
    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, cin = x.shape
        co = self.out_channels
        theta = EqualizedConv2d(co // 8, kernel_size=1, padding=0, use_bias=False,
                                dtype=self.dtype, name="theta")(x)
        phi = _max_pool_2x(
            EqualizedConv2d(co // 8, kernel_size=1, padding=0, use_bias=False,
                            dtype=self.dtype, name="phi")(x))
        g = _max_pool_2x(
            EqualizedConv2d(co // 2, kernel_size=1, padding=0, use_bias=False,
                            dtype=self.dtype, name="g")(x))
        theta = theta.reshape(b, h * w, co // 8)
        phi = phi.reshape(b, (h // 2) * (w // 2), co // 8)
        g = g.reshape(b, (h // 2) * (w // 2), co // 2)
        # [B, HW, HW/4] attention over pooled positions.
        logits = jnp.einsum("bnc,bmc->bnm", theta, phi,
                            preferred_element_type=jnp.float32)
        beta = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attended = jnp.einsum("bnm,bmc->bnc", beta, g,
                              preferred_element_type=jnp.float32).astype(x.dtype)
        attended = attended.reshape(b, h, w, co // 2)
        o = EqualizedConv2d(co, kernel_size=1, padding=0, use_bias=False,
                            dtype=self.dtype, name="o")(attended)
        gamma = self.param("gamma", nn.initializers.zeros, (), jnp.float32)
        if cin != co:
            res = EqualizedConv2d(co, kernel_size=1, padding=0, use_bias=False,
                                  dtype=self.dtype, name="residual")(x)
        else:
            res = x
        return (gamma.astype(x.dtype) * o + res) / math.sqrt(2.0)
