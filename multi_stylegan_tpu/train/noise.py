"""Latent-noise and permutation helpers (traced, fixed-shape).

Reference: reference multi_stylegan/misc.py:202-252.  The reference's
``get_noise`` returns either one tensor or a python list of two depending on
a host coin flip (misc.py:249-251); for jit stability we always return two
latents plus a traced "use mixing" flag - distributionally identical.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def get_noise(
    rng: jax.Array,
    batch_size: int,
    latent_dimension: int,
    p_mixed_noise: float = 0.9,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (z1 [B,D], z2 [B,D], use_mixing scalar bool)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    z1 = jax.random.normal(k1, (batch_size, latent_dimension))
    z2 = jax.random.normal(k2, (batch_size, latent_dimension))
    use_mixing = (
        jax.random.uniform(k3, ()) < p_mixed_noise if p_mixed_noise > 0
        else jnp.asarray(False)
    )
    return z1, z2, jnp.asarray(use_mixing)


def random_permutation(rng: jax.Array, n: int) -> jax.Array:
    """Random index sequence avoiding the identity (misc.py:202-213).

    Faithful to the reference quirk: indices are drawn WITH replacement
    (np.random.choice default), so repeats are possible - any wrong time
    order serves the augmentation.  If the draw equals the identity, the
    reversed sequence is returned.
    """
    perm = jax.random.randint(rng, (n,), 0, n)
    is_identity = jnp.all(perm == jnp.arange(n))
    return jnp.where(is_identity, jnp.arange(n - 1, -1, -1), perm)
