"""Exponential moving average over parameter pytrees.

Reference: reference multi_stylegan/misc.py:183-199 - a host loop over
``named_parameters`` with decay 0.999; parameters only, buffers NOT averaged.
Here it is a fused tree_map executed inside the jitted train step (no host
sync), per SURVEY.md §2.5.
"""

from __future__ import annotations

import jax


def ema_update(ema_params, train_params, decay: float = 0.999):
    """p_ema <- decay * p_ema + (1 - decay) * p_train."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        train_params,
    )
