"""Frechet distance between activation statistics.

Reference math: reference multi_stylegan/validation_metrics.py:191-219
(FID._calc_fid) and :400-428 (FVD._calc_fvd): numpy mean/cov,
``scipy.linalg.sqrtm`` on the host, imaginary part dropped.

A device-side Newton-Schulz variant is provided for on-TPU evaluation
(sqrtm is the only host-bound piece of the metric pipeline).
"""

from __future__ import annotations

import numpy as np


def frechet_distance(real_activations: np.ndarray, fake_activations: np.ndarray) -> float:
    """Exact reference formula (scipy sqrtm, host)."""
    from scipy.linalg import sqrtm

    real_mu = np.mean(real_activations, axis=0)
    real_cov = np.cov(real_activations, rowvar=False)
    fake_mu = np.mean(fake_activations, axis=0)
    fake_cov = np.cov(fake_activations, rowvar=False)
    assert real_mu.shape == fake_mu.shape
    assert real_cov.shape == fake_cov.shape
    diff = real_mu - fake_mu
    diff_squared = diff @ diff
    cov_mean, _ = sqrtm(real_cov @ fake_cov, disp=False)
    if np.iscomplexobj(cov_mean):
        cov_mean = cov_mean.real
    return float(
        diff_squared + np.trace(real_cov) + np.trace(fake_cov) - 2 * np.trace(cov_mean)
    )


def frechet_distance_device(real_activations, fake_activations,
                            n_iters: int = 30) -> float:
    """TPU-friendly variant: trace(sqrtm(A@B)) via Newton-Schulz iteration in
    float64-free form (normalized iteration, f32-safe)."""
    import jax.numpy as jnp

    ra = jnp.asarray(real_activations, jnp.float32)
    fa = jnp.asarray(fake_activations, jnp.float32)
    mu_r, mu_f = jnp.mean(ra, 0), jnp.mean(fa, 0)
    cr = jnp.cov(ra, rowvar=False)
    cf = jnp.cov(fa, rowvar=False)
    diff = mu_r - mu_f
    m = cr @ cf
    # Newton-Schulz: normalize, iterate Y/Z, sqrt(M) = Y * sqrt(||M||)
    norm = jnp.sqrt(jnp.sum(m * m))
    y = m / norm
    eye = jnp.eye(m.shape[0], dtype=m.dtype)
    z = eye
    for _ in range(n_iters):
        t = 0.5 * (3.0 * eye - z @ y)
        y = y @ t
        z = t @ z
    sqrt_m = y * jnp.sqrt(norm)
    fid = (diff @ diff + jnp.trace(cr) + jnp.trace(cf) - 2.0 * jnp.trace(sqrt_m))
    return float(fid)
