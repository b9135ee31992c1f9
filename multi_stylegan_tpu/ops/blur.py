"""Blur / resampling helpers built on upfirdn2d.

Mirrors the kernel construction and padding arithmetic of the reference
``Blur`` / ``Upsample`` modules (reference multi_stylegan/
multi_stylegan_generator.py:529-641 and u_net_2d_discriminator.py:220-332),
as free functions over NHWC arrays.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from multi_stylegan_tpu.ops.upfirdn2d import upfirdn2d


def make_blur_kernel(taps: Sequence[int] = (1, 3, 3, 1), gain: float = 1.0) -> jax.Array:
    """Outer-product, sum-normalized 2D FIR kernel, optionally gain-scaled.

    Matches ``Blur.make_kernel`` (multi_stylegan_generator.py:619-632); the
    ``gain`` argument covers the ``sampling_factor ** 2`` rescale applied when
    the blur follows a 2x upsampling (multi_stylegan_generator.py:600-602).
    """
    k = jnp.asarray(taps, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / jnp.sum(k)
    return k * gain


def blur_padding(
    n_taps: int, sampling_factor_padding: int = 2, kernel_size: int = 3
) -> Tuple[int, int]:
    """Padding used by ``Blur`` (multi_stylegan_generator.py:606-617)."""
    padding_factor = (n_taps - sampling_factor_padding) + (kernel_size - 1)
    return ((padding_factor + 1) // 2, padding_factor // 2)


def upsample_padding(n_taps: int, factor: int = 2) -> Tuple[int, int]:
    """Padding used by ``Upsample`` (multi_stylegan_generator.py:548-551)."""
    padding_factor = n_taps - factor
    return (((padding_factor + 1) // 2) + factor - 1, padding_factor // 2)


def blur(x: jax.Array, kernel: jax.Array, pad: Tuple[int, int], impl: str = None) -> jax.Array:
    """FIR blur of an NHWC tensor (no resampling)."""
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad, impl=impl)


def upsample2x(x: jax.Array, taps: Sequence[int] = (1, 3, 3, 1), impl: str = None) -> jax.Array:
    """2x blur-upsample of an NHWC tensor.

    Matches ``Upsample.forward`` (multi_stylegan_generator.py:568-575):
    upfirdn2d with up=2 and the gain-4 normalized kernel is NOT applied here -
    the reference ``Upsample`` uses the plain normalized kernel, the gain-4
    variant only appears inside ``ModulatedConv2d``'s post-transposed-conv
    blur (multi_stylegan_generator.py:324-326).
    """
    kernel = make_blur_kernel(taps)
    pad = upsample_padding(len(taps), factor=2)
    return upfirdn2d(x, kernel, up=2, down=1, pad=pad, impl=impl)
