"""Data layer: TLFM tif dataset, synthetic fixtures, prefetching loader."""

from multi_stylegan_tpu.data.tlfm import TLFMDataset, normalize_0_1  # noqa: F401
from multi_stylegan_tpu.data.synthetic import (  # noqa: F401
    SyntheticTLFMDataset,
    TeacherTLFMDataset,
)
from multi_stylegan_tpu.data.pipeline import BatchLoader  # noqa: F401
from multi_stylegan_tpu.data.transforms import ElasticDeformation, elastic_deformation  # noqa: F401
from multi_stylegan_tpu.data.trap_weights import make_trap_weights_map  # noqa: F401
