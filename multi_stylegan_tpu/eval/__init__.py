"""Evaluation: Inception-v3 / I3D ports, FID / FVD / IS metrics."""

from multi_stylegan_tpu.eval.frechet import frechet_distance, frechet_distance_device  # noqa: F401
from multi_stylegan_tpu.eval.inception_v3 import (  # noqa: F401
    InceptionV3,
    convert_torchvision_inception,
)
from multi_stylegan_tpu.eval.i3d import InceptionI3D, convert_pytorch_i3d  # noqa: F401
from multi_stylegan_tpu.eval.metrics import (  # noqa: F401
    FID,
    FVD,
    IS,
    WeightsUnavailable,
    normalize_m1_1_batch,
    resize_bilinear_antialias,
)
