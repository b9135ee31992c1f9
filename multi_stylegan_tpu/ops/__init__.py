"""TPU-native fused ops.

The reference ships exactly two CUDA extensions (reference
multi_stylegan/op_static/): ``upfirdn2d`` and ``fused_bias_act``.  Here both
are provided as

* a pure-XLA implementation (default) that the compiler fuses and that is
  differentiable to arbitrary order (R1 and path-length regularization need
  grad-of-grad), and
* a hand-written Pallas TPU kernel selectable per call or via
  :func:`set_default_impl`.
"""

from multi_stylegan_tpu.ops.upfirdn2d import upfirdn2d, upfirdn2d_xla  # noqa: F401
from multi_stylegan_tpu.ops.fused_act import fused_leaky_relu, fused_leaky_relu_xla  # noqa: F401
from multi_stylegan_tpu.ops.blur import make_blur_kernel, blur, upsample2x, blur_padding  # noqa: F401
from multi_stylegan_tpu.ops.modulated_conv import (  # noqa: F401
    modulated_conv2d,
    modulated_conv_transpose2d,
)
from multi_stylegan_tpu.ops.conv_grad import (  # noqa: F401
    conv2d,
    get_conv_impl,
    set_conv_impl,
)
