"""IO: experiment logger, orbax checkpoints, PyTorch checkpoint converter."""

from multi_stylegan_tpu.io.logger import Logger  # noqa: F401
from multi_stylegan_tpu.io.checkpoint import (  # noqa: F401
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)
from multi_stylegan_tpu.io.torch_convert import (  # noqa: F401
    convert_discriminator,
    convert_generator,
    convert_reference_checkpoint,
)
