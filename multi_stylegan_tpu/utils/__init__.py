"""Shared utilities."""

from multi_stylegan_tpu.utils.image import (  # noqa: F401
    normalize_0_1_batch,
    normalize_m1_1_batch,
)
from multi_stylegan_tpu.utils.telemetry import (  # noqa: F401
    RunTelemetry,
    set_process_title,
)
