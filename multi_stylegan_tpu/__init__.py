"""Multi-StyleGAN-TPU: a TPU-native (JAX/XLA/Pallas) framework for image-based
simulation of time-lapse fluorescence microscopy with a dual-domain StyleGAN2.

Re-designed from scratch for TPU hardware with the same capabilities as the
reference PyTorch implementation of "Multi-StyleGAN: Towards Image-Based
Simulation of Time-Lapse Live-Cell Microscopy" (MICCAI 2021,
arXiv:2106.08285; reference README.md:1-44).

Layering (bottom to top):
  ops/       fused TPU ops: upfirdn2d + fused bias/leaky-ReLU (XLA + Pallas)
  nn/        equalized-LR primitives, normalization, attention, resampling
  models/    dual-tower generator + U-Net discriminator + typed configs
  train/     losses, regularizers, ADA, EMA, fused jitted train steps, loop
  parallel/  device mesh, sharding rules, collective-aware train step
  data/      TLFM dataset pipeline + synthetic fixtures
  eval/      Inception-v3 / I3D ports, FID / FVD / IS with exact protocol
  io/        orbax checkpointing, PyTorch checkpoint converter, logger
  cli/       train / sample / interpolate entry points
"""

__version__ = "0.1.0"

from multi_stylegan_tpu.models.config import (  # noqa: F401
    GeneratorConfig,
    DiscriminatorConfig,
    TrainingConfig,
)
