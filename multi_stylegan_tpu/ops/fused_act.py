"""Fused bias + leaky-ReLU + scale.

Reference semantics: reference multi_stylegan/op_static/fused_bias_act_kernel.cu
(``y = act(x + broadcast(bias)) * scale``, LeakyReLU case 30) and
op_static/fused_act.py.  Two behavioral details carried over:

* The bias broadcasts over the *channel* axis.  The reference (NCHW) uses
  dim 1; this framework is NHWC so the channel axis defaults to ``-1``.
* The ``FusedLeakyReLU`` module default is ``scale=1.0``
  (fused_act.py:77) while the free-function default is ``sqrt(2)``
  (fused_act.py:88).  Every model use goes through the module, so the
  effective scale in the reference networks is 1.0.  Callers here pass scale
  explicitly.

The XLA implementation is a plain expression: XLA fuses it into the producing
conv/matmul, and it is differentiable to arbitrary order (needed for R1 and
path-length regularization).  A Pallas elementwise kernel with a
reference-style "gradient from the sign of the forward output" custom VJP is
provided for the inference/serving hot path via ``impl='pallas'``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_DEFAULT_IMPL = "xla"


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in ("xla", "pallas", "barrier"):
        raise ValueError(f"unknown impl {impl!r}")
    _DEFAULT_IMPL = impl


def _broadcast_bias(bias: jax.Array, ndim: int, axis: int) -> jax.Array:
    axis = axis % ndim
    shape = [1] * ndim
    shape[axis] = bias.shape[0]
    return bias.reshape(shape)


def fused_leaky_relu_xla(
    x: jax.Array,
    bias: jax.Array = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    axis: int = -1,
) -> jax.Array:
    """y = leaky_relu(x + bias_broadcast) * scale (pure XLA, infinitely AD-able)."""
    if bias is not None:
        x = x + _broadcast_bias(bias.astype(x.dtype), x.ndim, axis)
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(scale, x.dtype)


def fused_leaky_relu(
    x: jax.Array,
    bias: jax.Array = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    axis: int = -1,
    impl: str = None,
) -> jax.Array:
    """Dispatching fused bias + leaky-ReLU + scale.

    ``impl='barrier'`` is the XLA expression behind an
    ``optimization_barrier`` on its input: the barrier's transpose lands on
    the cotangent edge between the activation backward and the producing
    conv's backward, so XLA cannot fold the elementwise chain (mask
    recompute, scale casts, residual adds) into the backprop-filter fusions
    it schedules at 0.2-0.4 bandwidth utilization (PERF.md "The wall").
    """
    impl = impl or _DEFAULT_IMPL
    if impl == "pallas":
        from multi_stylegan_tpu.ops.pallas_kernels import fused_leaky_relu_pallas

        return fused_leaky_relu_pallas(
            x, bias, negative_slope=negative_slope, scale=scale, axis=axis
        )
    if impl == "barrier":
        x = jax.lax.optimization_barrier(x)
    return fused_leaky_relu_xla(x, bias, negative_slope, scale, axis)
