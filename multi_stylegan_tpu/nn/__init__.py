"""Neural-net primitives (equalized-LR layers, normalization, attention)."""

from multi_stylegan_tpu.nn.equalized import (  # noqa: F401
    EqualizedConv1d,
    EqualizedConv2d,
    EqualizedLinear,
    EqualizedTransposedConv2d,
    FusedLeakyReLUModule,
)
from multi_stylegan_tpu.nn.normalization import minibatch_std_dev, pixel_norm  # noqa: F401
from multi_stylegan_tpu.nn.attention import NonLocalBlock  # noqa: F401
