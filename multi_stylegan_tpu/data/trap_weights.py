"""Trap-region pixel-weight map builder.

The reference's pixel-wise losses accept an optional ``weight`` map
broadcast as [1, 1, 1, H, W] (reference multi_stylegan/loss.py:124-128) and
the ModelWrapper threads a ``trap_weights_map`` into the real/fake pixel
losses after a quarter of training (model_wrapper.py:31, 290-291, 405-406) —
but the reference never constructs one (train_multi_stylegan.py:113 passes
None), leaving the feature unusable end-to-end.  This builder closes that
gap: TLFM frames show a microfluidic trap roughly centered in the field of
view; the map up-weights that region with a smooth cosine taper so the
discriminator's pixel head focuses on the biologically relevant area.

The map is normalized to mean 1.0 so enabling it does not change the overall
pixel-loss scale (only its spatial distribution).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def make_trap_weights_map(
    resolution: Tuple[int, int] = (256, 256),
    center: Optional[Tuple[float, float]] = None,
    trap_fraction: float = 0.5,
    inside_weight: float = 2.0,
    outside_weight: float = 1.0,
    taper_fraction: float = 0.25,
) -> np.ndarray:
    """Build a [H, W] float32 weight map for the trap region.

    Args:
        resolution: (H, W) of the training images.
        center: trap center in pixels (y, x); defaults to the image center.
        trap_fraction: box half-extent as a fraction of min(H, W)/2 — the
            region at full ``inside_weight``.
        inside_weight / outside_weight: raw weights before normalization.
        taper_fraction: width of the cosine ramp between inside and outside,
            as a fraction of min(H, W)/2.

    Returns:
        np.ndarray [H, W] float32, mean exactly 1.0.
    """
    if not 0.0 < trap_fraction <= 1.0:
        raise ValueError(f"trap_fraction must be in (0, 1], got {trap_fraction}")
    if inside_weight <= 0 or outside_weight <= 0:
        raise ValueError("weights must be positive")
    h, w = resolution
    cy, cx = center if center is not None else ((h - 1) / 2.0, (w - 1) / 2.0)
    half = min(h, w) / 2.0
    r_in = trap_fraction * half
    ramp = max(taper_fraction * half, 1e-6)

    yy = np.abs(np.arange(h, dtype=np.float32) - cy)
    xx = np.abs(np.arange(w, dtype=np.float32) - cx)
    # Chebyshev (box) distance from the trap box edge, in pixels
    d = np.maximum(yy[:, None], xx[None, :]) - r_in
    # cosine taper: 1 inside, 0 beyond the ramp
    t = np.clip(d / ramp, 0.0, 1.0)
    blend = 0.5 * (1.0 + np.cos(np.pi * t))
    weights = outside_weight + (inside_weight - outside_weight) * blend
    weights = weights.astype(np.float32)
    return weights / weights.mean()
