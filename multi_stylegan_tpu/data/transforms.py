"""Data-space augmentations.

ElasticDeformation: reference dataset/tlfm_dataset.py:201-275 - random
displacement field, gaussian-smoothed (kernel size 4*sigma+1), scaled by
alpha, bilinear grid-sample with border padding.  Defined but unused by the
shipped training script, mirrored here for inventory parity; implemented in
pure jnp (differentiable, jit-able)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(sigma: int) -> jax.Array:
    kernel_size = sigma * 4 + 1
    mean = (kernel_size - 1) / 2.0
    coords = jnp.arange(kernel_size, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(coords, coords, indexing="xy")
    k = (1.0 / (2.0 * math.pi * sigma**2)) * jnp.exp(
        -((xg - mean) ** 2 + (yg - mean) ** 2) / (2.0 * sigma**2)
    )
    return k


def elastic_deformation(
    rng: jax.Array,
    img: jax.Array,
    alpha: int = 50,
    sigma: int = 12,
) -> jax.Array:
    """Random elastic deformation of [..., H, W] images (channels leading).

    Displacements ~U(-1,1) per pixel, gaussian-filtered (unnormalized kernel,
    as in the reference), scaled by alpha, sampled bilinearly with border
    clamping."""
    h, w = img.shape[-2], img.shape[-1]
    k = _gaussian_kernel(sigma)
    ks = k.shape[0]
    kx, ky = jax.random.split(rng)
    d = jax.random.uniform(kx, (2, 1, h, w), minval=-1.0, maxval=1.0)
    d = lax.conv_general_dilated(
        d, k[None, None], (1, 1), ((ks // 2, ks // 2), (ks // 2, ks // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) * alpha
    dx, dy = d[0, 0], d[1, 0]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = jnp.clip(xs + dx, 0, w - 1)
    sy = jnp.clip(ys + dy, 0, h - 1)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0

    lead = img.shape[:-2]
    flat = img.reshape(-1, h, w)

    def gather(yi, xi):
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return flat[:, yi, xi]

    out = (
        gather(y0, x0) * (1 - tx) * (1 - ty)
        + gather(y0, x0 + 1) * tx * (1 - ty)
        + gather(y0 + 1, x0) * (1 - tx) * ty
        + gather(y0 + 1, x0 + 1) * tx * ty
    )
    return out.reshape(*lead, h, w)


class ElasticDeformation:
    """Callable wrapper matching the reference module form
    (tlfm_dataset.py:201-227)."""

    def __init__(self, alpha: int = 80, sigma: int = 16) -> None:
        self.alpha = alpha
        self.sigma = sigma

    def __call__(self, rng: jax.Array, img: jax.Array) -> jax.Array:
        return elastic_deformation(rng, img, alpha=self.alpha, sigma=self.sigma)
