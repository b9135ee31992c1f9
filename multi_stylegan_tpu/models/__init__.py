"""Model zoo: dual-tower generator + U-Net discriminator."""

from multi_stylegan_tpu.models.config import (  # noqa: F401
    DiscriminatorConfig,
    GeneratorConfig,
    TrainingConfig,
    tiny_discriminator_config,
    tiny_generator_config,
)
from multi_stylegan_tpu.models.generator import Generator, StyleMapping  # noqa: F401
from multi_stylegan_tpu.models.discriminator import (  # noqa: F401
    Discriminator,
    binary_cut_mix_map,
    generate_cut_mix_augmentation_data,
    generate_cut_mix_transformation_data,
)
