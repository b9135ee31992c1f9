"""TLFM (trapped-yeast time-lapse fluorescence microscopy) dataset.

Reference semantics: reference dataset/tlfm_dataset.py + dataset/utils.py.
Behavior reproduced:

* scan position folders for ``.tif`` files; channel identified by filename
  substrings ``-BF0_`` / ``-GFP`` / ``-RFP``; z-slice by ``_000_``/``_001_``/
  ``_002_`` (tlfm_dataset.py:62-100)
* per (position, z): sort by (time step, trap id) via the reference's
  composite key (last ``-``-field with .tif stripped + 5th-from-last
  ``_``-field, tlfm_dataset.py:82-84)
* overlapping length-T windows kept only when all frames share a trap id
  (the 8 chars from "trap", tlfm_dataset.py:102-119)
* normalization: BF per-frame min-max to [0,1]; GFP/RFP fixed-range
  ``clip((x - min) / max, 0, 1)`` with gfp in [150, 2200], rfp in [20, 2000]
  (tlfm_dataset.py:27-30, 187-195 - note the reference divides by *max*,
  not (max - min); reproduced)
* vertical flip of all frames; random horizontal flip as the default
  augmentation (tlfm_dataset.py:24-25, 197)

Output per item: float32 ``[channels, T, H, W]`` in [0, 1], channels in
{1, 2, 3} for (no_gfp, no_rfp, full).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def normalize_0_1(frames: np.ndarray, vmax: Optional[float] = None,
                  vmin: Optional[float] = None) -> np.ndarray:
    """Per-leading-dim min-max normalization (dataset/utils.py:4-23)."""
    t = frames.reshape(frames.shape[0], -1)
    mn = t.min(axis=1, keepdims=True) if vmin is None else np.float32(vmin)
    mx = t.max(axis=1, keepdims=True) if vmax is None else np.float32(vmax)
    return ((t - mn) / (mx - mn)).reshape(frames.shape)


def _imread(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, -1)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32)


def _sort_key(path: str) -> str:
    # time step (last '-' field, '.tif' stripped) + trap id (5th-from-last
    # '_' field), matching tlfm_dataset.py:82-84.
    return path.split("-")[-1].split("_")[-1].replace(".tif", "") + path.split("_")[-5]


def _trap_id(path: str) -> str:
    i = path.find("trap")
    return path[i : i + 8]


class TLFMDataset:
    """Index-based dataset of [C, T, H, W] sequences."""

    def __init__(
        self,
        path: str,
        sequence_length: int = 3,
        overlap: bool = True,
        z_position_indications: Sequence[str] = ("_000_", "_001_", "_002_"),
        gfp_min: float = 150.0,
        gfp_max: float = 2200.0,
        rfp_min: float = 20.0,
        rfp_max: float = 2000.0,
        flip: bool = True,
        random_horizontal_flip: float = 0.5,
        positions: Optional[Sequence[str]] = None,
        no_rfp: bool = False,
        no_gfp: bool = False,
        seed: int = 0,
    ) -> None:
        self.sequence_length = sequence_length
        self.gfp_min, self.gfp_max = gfp_min, gfp_max
        self.rfp_min, self.rfp_max = rfp_min, rfp_max
        self.flip = flip
        self.random_horizontal_flip = random_horizontal_flip
        self.no_rfp, self.no_gfp = no_rfp, no_gfp
        self._rng = np.random.default_rng(seed)

        self.samples: List[Tuple[Tuple[str, ...], ...]] = []
        for position_folder in sorted(os.listdir(path)):
            if positions is not None and position_folder not in positions:
                continue
            folder = os.path.join(path, position_folder)
            if not os.path.isdir(folder):
                continue
            all_images = [
                os.path.join(folder, f) for f in os.listdir(folder) if "tif" in f
            ]
            by_channel = {
                "bf": [p for p in all_images if "-BF0_" in p],
                "gfp": [p for p in all_images if "-GFP" in p],
                "rfp": [p for p in all_images if "-RFP" in p],
            }
            for z in z_position_indications:
                zs = {
                    ch: sorted([p for p in paths if z in p], key=_sort_key)
                    for ch, paths in by_channel.items()
                }
                n = len(zs["bf"])
                step = 1 if overlap else sequence_length
                for i in range(0, n - sequence_length + 1, step):
                    window = zs["bf"][i : i + sequence_length]
                    traps = [_trap_id(p) for p in window]
                    if all(t == traps[0] for t in traps):
                        self.samples.append(
                            (
                                tuple(window),
                                tuple(zs["gfp"][i : i + sequence_length]),
                                tuple(zs["rfp"][i : i + sequence_length]),
                            )
                        )

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, item: int) -> np.ndarray:
        bf_paths, gfp_paths, rfp_paths = self.samples[item]
        channels = [np.stack([_imread(p) for p in bf_paths])]
        if not self.no_gfp:
            channels.append(np.stack([_imread(p) for p in gfp_paths]))
        if not self.no_rfp:
            channels.append(np.stack([_imread(p) for p in rfp_paths]))
        images = np.stack(channels)  # [C, T, H, W]
        # random horizontal flip (default transform, tlfm_dataset.py:24-25)
        if self.random_horizontal_flip > 0 and self._rng.uniform() < self.random_horizontal_flip:
            images = images[..., ::-1]
        # normalization (tlfm_dataset.py:187-195)
        images = images.copy()
        images[0] = normalize_0_1(images[0])
        idx = 1
        if not self.no_gfp:
            images[idx] = np.clip(
                np.clip(images[idx] - self.gfp_min, 0.0, None) / self.gfp_max, None, 1.0
            )
            idx += 1
        if not self.no_rfp:
            images[idx] = np.clip(
                np.clip(images[idx] - self.rfp_min, 0.0, None) / self.rfp_max, None, 1.0
            )
        # vertical flip (tlfm_dataset.py:197)
        if self.flip:
            images = images[..., ::-1, :]
        return np.ascontiguousarray(images, dtype=np.float32)
