"""Tests for the equalized-LR primitives, incl. torch oracles for the scale
arithmetic (torch used as an independent conv library, CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from multi_stylegan_tpu.nn import (
    EqualizedConv2d,
    EqualizedLinear,
    EqualizedTransposedConv2d,
    FusedLeakyReLUModule,
    NonLocalBlock,
    minibatch_std_dev,
    pixel_norm,
)


def test_equalized_linear_scales(rng):
    x = rng.normal(size=(4, 16)).astype(np.float32)
    layer = EqualizedLinear(8)
    variables = layer.init(jax.random.key(0), jnp.array(x))
    w = np.asarray(variables["params"]["weight"])  # [in, out]
    b = np.asarray(variables["params"]["bias"])
    y = layer.apply(variables, jnp.array(x))
    ref = x @ (w * math.sqrt(2 / 16)) + b * math.sqrt(2 / 8)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5)


def test_equalized_linear_bias_init_one_effective_value():
    """The style affine inits bias to 1.0 but the runtime bias scale makes the
    effective value sqrt(2/out) (equalized_layer.py:44+generator :344-346)."""
    layer = EqualizedLinear(32, bias_init=1.0)
    variables = layer.init(jax.random.key(0), jnp.zeros((1, 16)))
    y = layer.apply(variables, jnp.zeros((1, 16)))
    np.testing.assert_allclose(
        np.asarray(y), np.full((1, 32), math.sqrt(2 / 32), np.float32), rtol=1e-5
    )


def test_equalized_conv2d_vs_torch(rng):
    x = rng.normal(size=(2, 9, 9, 5)).astype(np.float32)
    layer = EqualizedConv2d(7, kernel_size=3, strides=2, padding=0)
    variables = layer.init(jax.random.key(0), jnp.array(x))
    w = np.asarray(variables["params"]["weight"])  # HWIO
    b = np.asarray(variables["params"]["bias"])
    y = layer.apply(variables, jnp.array(x))
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    wt = torch.tensor(w.transpose(3, 2, 0, 1)) * math.sqrt(2 / (5 * 9))
    bt = torch.tensor(b) * math.sqrt(2 / 7)
    yt = F.conv2d(xt, wt, bt, stride=2, padding=0).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)


def test_equalized_transposed_conv2d_vs_torch(rng):
    x = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
    layer = EqualizedTransposedConv2d(6, kernel_size=2, strides=2, padding=0)
    variables = layer.init(jax.random.key(0), jnp.array(x))
    w = np.asarray(variables["params"]["weight"])  # HWIO
    b = np.asarray(variables["params"]["bias"])
    y = layer.apply(variables, jnp.array(x))
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    # torch conv_transpose weight layout: [Cin, Cout, kh, kw]
    wt = torch.tensor(w.transpose(2, 3, 0, 1)) * math.sqrt(2 / (4 * 4))
    bt = torch.tensor(b) * math.sqrt(2 / 6)
    yt = F.conv_transpose2d(xt, wt, bt, stride=2, padding=0).numpy().transpose(0, 2, 3, 1)
    assert y.shape == yt.shape
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)


def test_pixel_norm(rng):
    x = rng.normal(size=(3, 16)).astype(np.float32)
    y = pixel_norm(jnp.array(x))
    ref = x / np.sqrt(np.mean(x ** 2, axis=-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5)


def test_minibatch_std_dev(rng):
    x = rng.normal(size=(4, 6, 6, 3)).astype(np.float32)
    y = minibatch_std_dev(jnp.array(x))
    assert y.shape == (4, 6, 6, 4)
    std = np.sqrt(np.maximum(np.var(x, axis=0), 1e-8)).mean()
    np.testing.assert_allclose(np.asarray(y[..., -1]), std, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y[..., :3]), x)


def test_fused_leaky_relu_module_default_scale_is_one(rng):
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    layer = FusedLeakyReLUModule(8)
    variables = layer.init(jax.random.key(0), jnp.array(x))
    y = layer.apply(variables, jnp.array(x))
    ref = np.where(x >= 0, x, 0.2 * x)  # zero bias at init, scale 1.0
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-6)


def test_non_local_block_gamma_zero_is_scaled_residual(rng):
    """gamma inits to 0, so the block reduces to residual / sqrt(2)
    (u_net_2d_discriminator.py:357, 381)."""
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    block = NonLocalBlock(16)
    variables = block.init(jax.random.key(0), jnp.array(x))
    y = block.apply(variables, jnp.array(x))
    np.testing.assert_allclose(np.asarray(y), x / math.sqrt(2), rtol=1e-5)
    # channel-changing variant uses a 1x1 residual conv
    block2 = NonLocalBlock(32)
    v2 = block2.init(jax.random.key(0), jnp.array(x))
    y2 = block2.apply(v2, jnp.array(x))
    assert y2.shape == (2, 8, 8, 32)


def test_attention_max_pool_gather_formulation(rng):
    """_max_pool_2x: identical forward to nn.max_pool, linear backward
    (clean grad-of-grad - the select-and-scatter formulation NaN'd the R1
    second-order program on TPU, see docstring)."""
    import flax.linen as fnn
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.nn.attention import _max_pool_2x

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_max_pool_2x(x)),
        np.asarray(fnn.max_pool(x, (2, 2), (2, 2))), rtol=1e-6)

    # first grad routes to the (first) argmax like torch
    g = jax.grad(lambda x: jnp.sum(_max_pool_2x(x) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    # grad-of-grad finite
    gg = jax.grad(lambda x: jnp.sum(jax.grad(
        lambda y: jnp.sum(_max_pool_2x(y) ** 2))(x) ** 2))(x)
    assert np.isfinite(np.asarray(gg)).all()


def test_nonlocal_block_second_order_finite(rng):
    """R1-style grad-of-grad through the NonLocal block stays finite even
    with large activations (the round-2 hardware NaN regression)."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.nn.attention import NonLocalBlock

    blk = NonLocalBlock(16)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32)) * 50.0
    params = blk.init(jax.random.key(0), x)["params"]
    # make gamma nonzero so the attention path carries gradient
    params = jax.tree.map(lambda p: p, params)
    params = dict(params)
    params["gamma"] = jnp.asarray(0.7)

    def inner_grad_norm(p, x):
        g = jax.grad(lambda xx: jnp.sum(blk.apply({"params": p}, xx)))(x)
        return 0.5 * jnp.sum(g * g)

    pen, grads = jax.value_and_grad(inner_grad_norm)(params, x)
    assert np.isfinite(float(pen))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
