"""GAN losses and regularizers (pure functions over arrays / closures).

Reference: reference multi_stylegan/loss.py.  All losses accept an optional
pixel ``weight`` map broadcast as [1, 1, 1, H, W] (loss.py:124-128).  The
Wasserstein and Hinge families are unused by the shipped trainer but part of
the reference inventory (SURVEY.md §2.2) and provided for parity.

R1 and path-length are *closure-taking* functions: the caller passes a
forward function (params already bound) and differentiates the returned
penalty w.r.t. params - JAX reverse-over-reverse replaces the reference's
``create_graph=True`` double-backward (loss.py:283-317, 353-395).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _apply_weight(x: jax.Array, weight: Optional[jax.Array]) -> jax.Array:
    if weight is None:
        return x
    w = weight.reshape(1, 1, 1, weight.shape[-2], weight.shape[-1])
    return x * w


# ------------------------------------------------------------------ logistic

def non_saturating_generator_loss(
    prediction_fake: jax.Array, weight: Optional[jax.Array] = None
) -> jax.Array:
    """mean(softplus(-D(G(z)))) (loss.py:97-131)."""
    return jnp.mean(_apply_weight(jax.nn.softplus(-prediction_fake), weight))


def non_saturating_discriminator_loss(
    prediction_real: jax.Array,
    prediction_fake: jax.Array,
    weight: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(mean softplus(-real), mean softplus(fake)) (loss.py:134-170)."""
    loss_real = jnp.mean(_apply_weight(jax.nn.softplus(-prediction_real), weight))
    loss_fake = jnp.mean(_apply_weight(jax.nn.softplus(prediction_fake), weight))
    return loss_real, loss_fake


def non_saturating_discriminator_loss_cut_mix(
    prediction: jax.Array, label: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel-labelled NS loss for cut-mix batches (loss.py:173-195)."""
    loss_real = jnp.mean(jax.nn.softplus(-prediction) * label)
    loss_fake = jnp.mean(jax.nn.softplus(prediction) * (1.0 - label))
    return loss_real, loss_fake


# --------------------------------------------------------------- wasserstein

def wasserstein_generator_loss(
    prediction_fake: jax.Array, weight: Optional[jax.Array] = None
) -> jax.Array:
    return -jnp.mean(_apply_weight(prediction_fake, weight))


def wasserstein_discriminator_loss(
    prediction_real: jax.Array,
    prediction_fake: jax.Array,
    weight: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    return (
        -jnp.mean(_apply_weight(prediction_real, weight)),
        jnp.mean(_apply_weight(prediction_fake, weight)),
    )


def wasserstein_discriminator_loss_cut_mix(
    prediction: jax.Array, label: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    return (-jnp.mean(prediction * label), jnp.mean(prediction * (1.0 - label)))


# --------------------------------------------------------------------- hinge

hinge_generator_loss = wasserstein_generator_loss  # loss.py:198-209


def hinge_discriminator_loss(
    prediction_real: jax.Array,
    prediction_fake: jax.Array,
    weight: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    loss_real = -jnp.mean(_apply_weight(jnp.minimum(0.0, prediction_real - 1.0), weight))
    loss_fake = -jnp.mean(_apply_weight(jnp.minimum(0.0, -prediction_fake - 1.0), weight))
    return loss_real, loss_fake


def hinge_discriminator_loss_cut_mix(
    prediction: jax.Array, label: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    loss_real = -jnp.mean(jnp.minimum(0.0, prediction - 1.0) * label)
    loss_fake = -jnp.mean(jnp.minimum(0.0, -prediction - 1.0) * (1.0 - label))
    return loss_real, loss_fake


# ----------------------------------------------------------- regularizations

def r1_penalty(
    d_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    images: jax.Array,
    use_pixel_head: bool = True,
) -> jax.Array:
    """R1 = 0.5 * E[ || grad_x (D_scalar(x).sum() + D_pixel(x).sum()) ||^2 ]
    - gradients through BOTH heads (loss.py:302-317)."""

    def out_sum(x):
        scalar, pixel = d_fn(x)
        s = jnp.sum(scalar)
        if use_pixel_head:
            s = s + jnp.sum(pixel)
        return s

    grad = jax.grad(out_sum)(images)
    sq = jnp.sum(jnp.square(grad.reshape(grad.shape[0], -1)), axis=1)
    return 0.5 * jnp.mean(sq)


def r2_penalty(
    d_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array]], images_fake: jax.Array
) -> jax.Array:
    """R2: same gradient penalty evaluated on fakes, scalar head only
    (loss.py:320-350; unused by the shipped trainer)."""

    def out_sum(x):
        scalar, _ = d_fn(x)
        return jnp.sum(scalar)

    grad = jax.grad(out_sum)(images_fake)
    sq = jnp.sum(jnp.square(grad.reshape(grad.shape[0], -1)), axis=1)
    return 0.5 * jnp.mean(sq)


def path_length_grads(
    synth_fn: Callable[[jax.Array], jax.Array],
    wplus: jax.Array,
    rng: jax.Array,
) -> jax.Array:
    """grad_w (G(w) . noise) with noise ~ N(0, 1/(T*H*W))
    (multi_stylegan_generator.py:192-200); differentiable again w.r.t. params
    through JAX reverse-over-reverse."""
    image_shape = jax.eval_shape(synth_fn, wplus).shape
    t, h, w = image_shape[2], image_shape[3], image_shape[4]
    noise = jax.random.normal(rng, image_shape) / math.sqrt(t * h * w)

    def dotted(wp):
        return jnp.sum(synth_fn(wp) * noise)

    return jax.grad(dotted)(wplus)


def path_length_penalty(
    grads: jax.Array, mean_path_length: jax.Array, decay: float = 0.01
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Penalty vs. a decayed running mean (loss.py:378-395).

    Matches the reference gradient structure exactly: the running mean enters
    the penalty through its *updated* value, which itself depends on the new
    path lengths, so the effective gradient factor is (1 - decay).

    Returns (penalty, path_lengths_scalar, new_mean_path_length_state).
    """
    pl = jnp.mean(jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grads), axis=2), axis=1) + 1e-8))
    mean_detached = jax.lax.stop_gradient(mean_path_length)
    new_mean = mean_detached + decay * (pl - mean_detached)
    penalty = jnp.mean(jnp.square(pl - new_mean))
    return penalty, pl, jax.lax.stop_gradient(new_mean)


# --------------------------------------------------------------------- top-k

def top_k_v(iteration: jax.Array, starting_iteration: int, final_iteration: int) -> jax.Array:
    """Keep-fraction schedule: 1.0 until start, linear to 0.5 at finish
    (loss.py:417-430). ``iteration`` is the 1-based step counter."""
    frac = (iteration - starting_iteration) / max(1, final_iteration - starting_iteration)
    v = 0.5 * (1.0 - frac) + 0.5
    v = jnp.where(iteration <= starting_iteration, 1.0, v)
    v = jnp.where(iteration >= final_iteration, 0.5, v)
    return v


def top_k_mask(prediction: jax.Array, v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """jit-stable top-k selection over flattened scalar predictions
    (loss.py:432-444): returns a {0,1} mask with exactly k = max(1, floor(B*v))
    ones (rank-based, tie-safe) and k as a float.

    The reference gathers with torch.topk; masked means with the same k
    denominator are numerically identical."""
    flat = prediction.reshape(-1)
    n = flat.shape[0]
    k = jnp.maximum(1, (n * v).astype(jnp.int32))
    order = jnp.argsort(-flat)  # descending
    ranks = jnp.argsort(order)
    mask = (ranks < k).astype(flat.dtype)
    return mask.reshape(prediction.shape), k.astype(flat.dtype)
