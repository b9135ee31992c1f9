"""Unit tests for the fused ops layer (SURVEY.md §4 item 1).

Oracles are written from first principles (numpy zero-stuff/pad/correlate and
per-sample-weight convs), NOT ported from the reference, so they are an
independent check of the semantics.
"""

import math

import jax
import jax.test_util
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from multi_stylegan_tpu.ops import (
    blur,
    fused_leaky_relu,
    fused_leaky_relu_xla,
    make_blur_kernel,
    modulated_conv2d,
    modulated_conv_transpose2d,
    upfirdn2d,
    upsample2x,
)
from multi_stylegan_tpu.ops.blur import blur_padding, upsample_padding
from multi_stylegan_tpu.ops.upfirdn2d import out_size


def upfirdn2d_numpy(x, k, up, down, pad):
    """Independent numpy oracle: zero-stuff, pad, convolve (flipped), stride."""
    b, h, w, c = x.shape
    kh, kw = k.shape
    p0, p1 = pad
    # zero-stuff
    xu = np.zeros((b, h * up, w * up, c), dtype=np.float64)
    xu[:, ::up, ::up, :] = x
    # pad (supports negative = crop)
    def padcrop(a, lo, hi, axis):
        pads = [(0, 0)] * a.ndim
        pads[axis] = (max(lo, 0), max(hi, 0))
        a = np.pad(a, pads)
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(max(-lo, 0), a.shape[axis] - max(-hi, 0))
        return a[tuple(sl)]

    xu = padcrop(xu, p0, p1, 1)
    xu = padcrop(xu, p0, p1, 2)
    kf = k[::-1, ::-1]
    ho = xu.shape[1] - kh + 1
    wo = xu.shape[2] - kw + 1
    y = np.zeros((b, ho, wo, c), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            y += kf[i, j] * xu[:, i : i + ho, j : j + wo, :]
    return y[:, ::down, ::down, :]


@pytest.mark.parametrize(
    "up,down,pad,k",
    [
        (1, 1, (2, 2), 4),   # blur before k3 conv
        (1, 1, (2, 1), 4),   # blur after upsampling modconv (k2)
        (2, 1, (3, 1), 4),   # Upsample module
        (1, 2, (1, 1), 4),   # downsample (not used by models, API parity)
        (1, 1, (1, 1), 3),
        (2, 1, (1, 1), 2),
        (1, 1, (-1, 2), 4),  # negative padding
    ],
)
def test_upfirdn2d_matches_numpy(rng, up, down, pad, k):
    x = rng.normal(size=(2, 9, 11, 3)).astype(np.float32)
    taps = rng.normal(size=(k, k)).astype(np.float32)
    ref = upfirdn2d_numpy(x.astype(np.float64), taps.astype(np.float64), up, down, pad)
    got = upfirdn2d(jnp.array(x), jnp.array(taps), up=up, down=down, pad=pad)
    assert got.shape == ref.shape
    assert got.shape[1] == out_size(9, up, down, pad[0], pad[1], k)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_grad_and_gradgrad(rng):
    x = jnp.array(rng.normal(size=(1, 6, 6, 2)).astype(np.float32))
    taps = make_blur_kernel()

    def f(x):
        return jnp.sum(jnp.sin(upfirdn2d(x, taps, up=2, pad=(3, 1))))

    jax.test_util.check_grads(f, (x,), order=2, modes=("rev",), atol=1e-2, rtol=1e-2)


def test_blur_paddings_match_reference_arithmetic():
    # Blur before k3 conv: (len4 - 2) + (3 - 1) = 4 -> (2, 2)
    assert blur_padding(4, 2, 3) == (2, 2)
    # Blur after k2 upsampling conv: (4 - 2) + (2 - 1) = 3 -> (2, 1)
    assert blur_padding(4, 2, 2) == (2, 1)
    # Upsample: pf = 4 - 2 = 2 -> ((2+1)//2 + 2 - 1, 2//2) = (2, 1)
    assert upsample_padding(4, 2) == (2, 1)


def test_upsample2x_shape(rng):
    x = jnp.array(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    y = upsample2x(x)
    assert y.shape == (2, 16, 16, 3)
    # Reference quirk: Upsample does NOT apply the factor**2 gain that stock
    # StyleGAN2 uses (multi_stylegan_generator.py:553-566 normalizes only),
    # so DC is attenuated by up^2 = 4.
    y1 = upsample2x(jnp.ones((1, 8, 8, 1)))
    np.testing.assert_allclose(np.asarray(y1[0, 4:12, 4:12, 0]), 0.25, rtol=1e-5)


def test_fused_leaky_relu_values(rng):
    x = jnp.array(rng.normal(size=(4, 5, 5, 8)).astype(np.float32))
    b = jnp.array(rng.normal(size=(8,)).astype(np.float32))
    y = fused_leaky_relu_xla(x, b, 0.2, math.sqrt(2.0))
    z = x + b[None, None, None, :]
    ref = np.where(z >= 0, z, 0.2 * z) * math.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-6)
    # channel axis override (2D styles)
    x2 = jnp.array(rng.normal(size=(3, 8)).astype(np.float32))
    y2 = fused_leaky_relu_xla(x2, b, 0.2, 1.0, axis=-1)
    z2 = x2 + b[None, :]
    np.testing.assert_allclose(np.asarray(y2), np.where(z2 >= 0, z2, 0.2 * z2), rtol=1e-6)


def test_fused_leaky_relu_pallas_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.array(rng.normal(size=(2, 3, 3, 8)).astype(np.float32))
    b = jnp.array(rng.normal(size=(8,)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        y = fused_leaky_relu(x, b, impl="pallas")
        ref = fused_leaky_relu_xla(x, b)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6)
        # first and second order grads match the XLA expression
        gp = jax.grad(lambda x, b: jnp.sum(fused_leaky_relu(x, b, impl="pallas") ** 2))(x, b)
        gx = jax.grad(lambda x, b: jnp.sum(fused_leaky_relu_xla(x, b) ** 2))(x, b)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-5, atol=1e-6)

        def second_order(f):
            def inner(x):
                g = jax.grad(lambda x: jnp.sum(f(x) ** 2))(x)
                return jnp.sum(g ** 2)

            return jax.grad(inner)(x)

        g2p = second_order(lambda x: fused_leaky_relu(x, b, impl="pallas"))
        g2x = second_order(lambda x: fused_leaky_relu_xla(x, b))
        np.testing.assert_allclose(np.asarray(g2p), np.asarray(g2x), rtol=1e-4, atol=1e-5)


def _naive_modconv(x, w, s, scale, demodulate, padding, transpose=False):
    """Per-sample-weight oracle via explicit loop (the reference's grouped-conv
    formulation, multi_stylegan_generator.py:383-411, re-derived independently)."""
    b = x.shape[0]
    outs = []
    for i in range(b):
        wi = w * s[i][None, None, :, None] * scale  # [kh,kw,Cin,Cout]
        if demodulate:
            d = 1.0 / np.sqrt(np.sum(np.square(wi), axis=(0, 1, 2)) + 1e-8)
            wi = wi * d[None, None, None, :]
        if transpose:
            kh, kw = wi.shape[0], wi.shape[1]
            y = lax.conv_general_dilated(
                x[i : i + 1],
                jnp.flip(jnp.array(wi), (0, 1)),
                (1, 1),
                ((kh - 1, kh - 1), (kw - 1, kw - 1)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=lax.Precision.HIGHEST,
            )
        else:
            y = lax.conv_general_dilated(
                x[i : i + 1],
                jnp.array(wi),
                (1, 1),
                padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=lax.Precision.HIGHEST,
            )
        outs.append(np.asarray(y[0]))
    return np.stack(outs)


@pytest.mark.parametrize("demodulate", [True, False])
@pytest.mark.parametrize("k,padding", [(3, "SAME"), (1, "VALID")])
def test_modulated_conv2d_matches_per_sample(rng, demodulate, k, padding):
    cin, cout = 6, 5
    x = rng.normal(size=(3, 7, 7, cin)).astype(np.float32)
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    s = rng.normal(size=(3, cin)).astype(np.float32) + 1.0
    scale = math.sqrt(2) / math.sqrt(cin * k * k)
    ref = _naive_modconv(x, w, s, scale, demodulate, padding)
    got = modulated_conv2d(
        jnp.array(x), jnp.array(w), jnp.array(s),
        scale=scale, demodulate=demodulate, padding=padding,
        precision=lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv_transpose2d_matches_per_sample(rng, demodulate):
    cin, cout, k = 6, 5, 2
    x = rng.normal(size=(2, 5, 5, cin)).astype(np.float32)
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    s = rng.normal(size=(2, cin)).astype(np.float32) + 1.0
    scale = math.sqrt(2) / math.sqrt(cin * k * k)
    ref = _naive_modconv(x, w, s, scale, demodulate, None, transpose=True)
    got = modulated_conv_transpose2d(
        jnp.array(x), jnp.array(w), jnp.array(s),
        scale=scale, demodulate=demodulate,
        precision=lax.Precision.HIGHEST,
    )
    assert got.shape == (2, 10, 10, cout)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


def test_modulated_conv_gradgrad(rng):
    """Path-length regularization differentiates twice through modulated convs."""
    cin, cout, k = 4, 4, 3
    x = jnp.array(rng.normal(size=(2, 5, 5, cin)).astype(np.float32))
    w = jnp.array(rng.normal(size=(k, k, cin, cout)).astype(np.float32))
    s = jnp.array(rng.normal(size=(2, cin)).astype(np.float32))
    scale = 1.0 / math.sqrt(cin * k * k)

    def f(s):
        y = modulated_conv2d(x, w, s, scale=scale, demodulate=True, padding="SAME")
        return jnp.sum(jnp.tanh(y))

    jax.test_util.check_grads(f, (s,), order=2, modes=("rev",), atol=5e-2, rtol=5e-2)


def test_modulated_conv_transpose_depth_to_space_equivalence(rng):
    """The k==stride fast path (1x1 contraction + depth-to-space) must equal
    the general dilated-conv formulation exactly (non-overlapping scatter
    windows: each output pixel receives one tap)."""
    import jax.numpy as jnp
    from jax import lax

    from multi_stylegan_tpu.ops.modulated_conv import (
        _demod_factors,
        _style_scale_input,
        modulated_conv_transpose2d,
    )

    x = jnp.asarray(rng.normal(size=(3, 5, 7, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 2, 16, 24)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    got = modulated_conv_transpose2d(x, w, s, scale=0.37, demodulate=True)

    xs = _style_scale_input(x, s)
    wf = jnp.flip(w, (0, 1)) * 0.37
    ref = lax.conv_general_dilated(
        xs, wf, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = ref * _demod_factors(w, s, 0.37, 1e-8)[:, None, None, :]
    assert got.shape == (3, 10, 14, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_leaky_relu_barrier_impl_matches_xla(rng):
    """impl='barrier' (optimization_barrier fusion isolation, PERF.md) is
    numerically identical to the plain expression through second order."""
    import jax

    from multi_stylegan_tpu.ops.fused_act import fused_leaky_relu

    x = jnp.array(rng.normal(size=(4, 8, 8, 16)).astype(np.float32))
    b = jnp.array(rng.normal(size=(16,)).astype(np.float32))

    def loss(impl):
        def f(x):
            return jnp.sum(jnp.sin(fused_leaky_relu(x, b, scale=1.3, impl=impl)))
        return f

    np.testing.assert_array_equal(
        np.asarray(fused_leaky_relu(x, b, impl="barrier")),
        np.asarray(fused_leaky_relu(x, b, impl="xla")))
    g_b = jax.grad(loss("barrier"))(x)
    g_x = jax.grad(loss("xla"))(x)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_x), rtol=1e-6)

    def second(impl):
        return jax.grad(lambda x: jnp.sum(jax.grad(loss(impl))(x) ** 2))(x)

    np.testing.assert_allclose(np.asarray(second("barrier")),
                               np.asarray(second("xla")), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "k,stride,pad",
    [
        (3, 1, 1),   # D ResNet conv / G modulated k3 (SAME)
        (1, 1, 0),   # k1 heads / output blocks
        (3, 2, 0),   # D encoder downscale (k3 s2 p0)
        (4, 2, 1),   # non-model shape: even kernel + asymmetric output
    ],
)
def test_conv2d_mmgrad_matches_xla_to_second_order(rng, k, stride, pad):
    """impl='mmgrad' (explicit dot_general filter gradients, PERF.md fusion
    wall) is numerically equivalent to the plain conv through grad-of-grad
    for every conv shape class the models use."""
    from multi_stylegan_tpu.ops.conv_grad import conv2d

    x = jnp.array(rng.normal(size=(2, 9, 9, 5)).astype(np.float32))
    w = jnp.array(rng.normal(size=(k, k, 5, 7)).astype(np.float32))

    def f(impl):
        def call(x, w):
            y = conv2d(x, w, strides=stride, padding=((pad, pad), (pad, pad)),
                       precision=lax.Precision.HIGHEST, impl=impl)
            return jnp.sum(jnp.sin(y))
        return call

    y_mm = conv2d(x, w, strides=stride, padding=((pad, pad), (pad, pad)),
                  precision=lax.Precision.HIGHEST, impl="mmgrad")
    y_xla = conv2d(x, w, strides=stride, padding=((pad, pad), (pad, pad)),
                   precision=lax.Precision.HIGHEST, impl="xla")
    np.testing.assert_array_equal(np.asarray(y_mm), np.asarray(y_xla))

    for argnums in (0, 1):
        g_mm = jax.grad(f("mmgrad"), argnums)(x, w)
        g_xla = jax.grad(f("xla"), argnums)(x, w)
        np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_xla),
                                   rtol=1e-5, atol=1e-5)

    # reverse-over-reverse, the R1 / path-length pattern: inner grad w.r.t.
    # the INPUT (loss.py:310-317), outer grad of its norm w.r.t. the WEIGHT
    def second(impl):
        def penalty(w):
            g = jax.grad(lambda xx: f(impl)(xx, w))(x)
            return jnp.sum(g * g)
        return jax.grad(penalty)(w)

    np.testing.assert_allclose(np.asarray(second("mmgrad")),
                               np.asarray(second("xla")),
                               rtol=1e-4, atol=1e-4)


def test_conv2d_mmgrad_same_padding_string(rng):
    """String paddings are normalized to the same explicit pads XLA uses."""
    from multi_stylegan_tpu.ops.conv_grad import conv2d

    x = jnp.array(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    w = jnp.array(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))

    def loss(impl):
        def call(w):
            return jnp.sum(conv2d(x, w, padding="SAME",
                                  precision=lax.Precision.HIGHEST, impl=impl) ** 2)
        return call

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss("mmgrad"))(w)),
        np.asarray(jax.grad(loss("xla"))(w)), rtol=1e-5, atol=1e-5)


def test_conv_impl_switch_round_trip():
    from multi_stylegan_tpu.ops import get_conv_impl, set_conv_impl

    assert get_conv_impl() == "xla"
    try:
        set_conv_impl("mmgrad")
        assert get_conv_impl() == "mmgrad"
        with pytest.raises(ValueError):
            set_conv_impl("nope")
    finally:
        set_conv_impl("xla")
