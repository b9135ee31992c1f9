"""Training algorithms: losses, regularizers, ADA, EMA, fused train steps."""

from multi_stylegan_tpu.train import losses  # noqa: F401
from multi_stylegan_tpu.train.ada import (  # noqa: F401
    AdaState,
    augment_sequences,
    augmentation_pipeline,
    calc_r,
    update_ada_state,
)
from multi_stylegan_tpu.train.ema import ema_update  # noqa: F401
from multi_stylegan_tpu.train.noise import get_noise, random_permutation  # noqa: F401
from multi_stylegan_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_discriminator_optimizer,
    make_generator_optimizer,
)
from multi_stylegan_tpu.train.steps import StepFlags, make_train_step  # noqa: F401
