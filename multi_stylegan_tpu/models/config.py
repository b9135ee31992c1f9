"""Typed model / training configs with the reference defaults.

Mirrors the three plain dicts of reference multi_stylegan/config.py:6-57 and
the argparse defaults of train_multi_stylegan.py:4-28 as frozen dataclasses.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """Dual-tower StyleGAN2 generator config (reference config.py:16-27)."""

    channels: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    channel_factor: float = 1
    latent_dimensions: int = 512
    depth_style_mapping: int = 8
    starting_resolution: Tuple[int, int] = (4, 4)
    # Frames generated per domain (the reference hard-codes 3:
    # multi_stylegan_generator.py:30).
    sequence_length: int = 3
    # Number of imaging domains (towers).  The reference hard-codes 2 (BF+GFP).
    num_domains: int = 2
    blur_taps: Tuple[int, ...] = (1, 3, 3, 1)
    # Reference behavioral quirk: the tower-2 output blocks consume tower-1
    # features (multi_stylegan_generator.py:189).  Default False = the
    # symmetric (almost certainly intended) version; set True to reproduce the
    # published-checkpoint behavior exactly.
    compat_tower2_output_bug: bool = False
    # Activation compute dtype ("float32" or "bfloat16"); params stay fp32,
    # outputs are returned fp32.
    compute_dtype: str = "float32"
    # Rematerialize styled-conv/output blocks in the backward pass (trades
    # ~30% extra flops for large activation-memory savings; required to fit
    # the full config's path-length double-backward at batch 24 on one chip).
    remat: bool = True
    # Selective remat: with remat=True, only blocks whose spatial extent is
    # >= this many pixels are rematerialized (0 = every block, the round-2
    # behavior).  The memory is in the large feature maps; the cheap
    # low-resolution blocks are not worth recomputing (VERDICT round-2
    # item 3: reach the reference's batch 24, README.md:128).
    remat_min_px: int = 0

    @property
    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(int(c // self.channel_factor) for c in self.channels)

    @property
    def n_stages(self) -> int:
        """Number of upsampling stages (6 for the 4->256 default)."""
        return len(self.channels) - 1

    @property
    def n_latents(self) -> int:
        """Per-layer w slots: 2*(len(channels)-1) + 2 = 14 by default
        (multi_stylegan_generator.py:155-160)."""
        return 2 * self.n_stages + 2

    @property
    def resolution(self) -> Tuple[int, int]:
        r = 2 ** self.n_stages
        return (self.starting_resolution[0] * r, self.starting_resolution[1] * r)


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """U-Net discriminator config (reference config.py:6-13)."""

    encoder_channels: Tuple[Tuple[int, int], ...] = (
        (3, 128), (128, 256), (256, 384), (384, 768), (768, 1024),
    )
    decoder_channels: Tuple[Tuple[int, int], ...] = (
        (1024, 768), (768, 384), (384, 256), (256, 128),
    )
    fft: bool = False
    no_rfp: bool = True
    no_gfp: bool = False
    sequence_length: int = 3
    # Activation compute dtype ("float32" or "bfloat16"); params stay fp32,
    # heads are returned fp32.
    compute_dtype: str = "float32"
    # Rematerialize encoder/decoder blocks in the backward pass.
    remat: bool = True
    # Selective remat threshold in pixels (see GeneratorConfig.remat_min_px).
    remat_min_px: int = 0

    @property
    def input_channels(self) -> int:
        """Flattened channel*time input width (u_net_2d_discriminator.py:35-50)."""
        if self.no_gfp:
            return self.sequence_length
        if self.no_rfp:
            return 2 * self.sequence_length
        return 3 * self.sequence_length


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    """Training hyperparameters (reference config.py:30-57 +
    train_multi_stylegan.py:4-28 argparse defaults)."""

    batch_size: int = 24
    epochs: int = 100
    lr_generator: float = 2e-4
    lr_discriminator: float = 6e-4
    # The style-mapping net trains at lr/100 (train_multi_stylegan.py:53-55).
    lr_style_factor: float = 0.01
    adam_beta1: float = 0.0
    adam_beta2: float = 0.999
    grad_clip_norm: float = 5.0
    # Skip parameter updates containing non-finite values (optax
    # apply_if_finite; train/state.py::_finite_guard).  The reference has no
    # such guard and one bad second-order step corrupts every parameter.
    # CHECKPOINT-FORMAT NOTE: toggling this changes the optimizer-state
    # pytree structure (apply_if_finite wraps the inner state), so
    # checkpoints only restore under the same setting they were saved with;
    # io/checkpoint.py raises a pointed error on the mismatch.
    skip_nonfinite_updates: bool = True
    max_consecutive_nonfinite: int = 100
    ema_decay: float = 0.999
    p_mixed_noise: float = 0.9
    lazy_generator_regularization: int = 16
    w_generator_regularization: float = math.log(2) / ((256 ** 2) * (math.log(256) - math.log(2)))
    lazy_discriminator_regularization: int = 16
    w_discriminator_regularization_r1: float = 10.0
    w_discriminator_regularization: float = 4.0
    batch_factor_wrong_order: float = 0.25
    batch_size_shrink_path_length_regularization: float = 0.5
    top_k: bool = True
    top_k_start: float = 0.25
    top_k_finish: float = 0.75
    wrong_order_start: float = 0.75
    trap_weight_start: float = 0.25
    path_length_decay: float = 0.01
    # ADA controller (reference adaptive_discriminator_augmentation.py:18-41)
    ada: bool = True
    ada_r_target: float = 0.6
    ada_p_step: float = 5e-3
    ada_r_update: int = 8
    ada_p_max: float = 0.8
    ada_p_init: float = 0.05
    # Reproduce the reference's four SEPARATE kornia warps (iso scale /
    # rotation / aniso scale / rotation each resampled independently,
    # adaptive_discriminator_augmentation.py:131-199) instead of the
    # TPU-first single composed warp.  Same net geometry; opt-in for exact
    # reference behavior at the cost of 4x the resampling (and blur).
    ada_sequential_warps: bool = False
    # TPU execution policy (new, no reference equivalent)
    compute_dtype: str = "bfloat16"
    validate_every_n_epochs: int = 10
    checkpoint_every_n_epochs: int = 5
    resume_training: bool = False
    seed: int = 0


def tiny_generator_config(**overrides) -> GeneratorConfig:
    """A 32x32 fixture config for tests / smoke training (SURVEY.md §4 item 5)."""
    kw = dict(
        channels=(32, 32, 32, 32),
        latent_dimensions=32,
        depth_style_mapping=2,
    )
    kw.update(overrides)
    return GeneratorConfig(**kw)


def tiny_discriminator_config(**overrides) -> DiscriminatorConfig:
    kw = dict(
        encoder_channels=((3, 16), (16, 24), (24, 32), (32, 48)),
        decoder_channels=((48, 32), (32, 24), (24, 16)),
    )
    kw.update(overrides)
    return DiscriminatorConfig(**kw)
