"""Experiment logger with the reference's directory contract.

Reference: reference multi_stylegan/misc.py:13-180 - creates
``experiments/<dd_mm_YYYY__HH_MM_SS>/{metrics,hyperparameters,plots,models}``,
appends scalars to in-memory lists flushed as one file per metric each epoch,
dumps hyperparameters as stringified json, and saves sample grids as PNGs
with per-domain tinting (BF grey, GFP green, RFP red; misc.py:132-166).

Metric streams are saved as ``.npy`` (the reference used ``torch.save``
tensors) plus an optional TensorBoard scalar writer.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Any, Dict, Iterable, Optional, Union

import numpy as np


class Logger:
    def __init__(
        self,
        experiment_path: Optional[str] = None,
        experiment_path_extension: str = "",
        path_metrics: str = "metrics",
        path_hyperparameters: str = "hyperparameters",
        path_plots: str = "plots",
        path_models: str = "models",
        tensorboard: bool = False,
    ) -> None:
        if experiment_path is None:
            experiment_path = os.path.join(
                os.getcwd(), "experiments", datetime.now().strftime("%d_%m_%Y__%H_%M_%S")
            )
        experiment_path = experiment_path + experiment_path_extension
        self.experiment_path = experiment_path
        self.path_metrics = os.path.join(experiment_path, path_metrics)
        self.path_hyperparameters = os.path.join(experiment_path, path_hyperparameters)
        self.path_plots = os.path.join(experiment_path, path_plots)
        self.path_models = os.path.join(experiment_path, path_models)
        for p in (self.path_metrics, self.path_hyperparameters, self.path_plots,
                  self.path_models):
            os.makedirs(p, exist_ok=True)
        self.metrics: Dict[str, list] = {}
        self.temp_metrics: Dict[str, list] = {}
        self.hyperparameters: Dict[str, list] = {}
        self._tb_writer = None
        if tensorboard:
            try:
                import tensorflow as tf  # optional; baked into the image

                self._tb_writer = tf.summary.create_file_writer(
                    os.path.join(experiment_path, "tensorboard")
                )
            except Exception:
                self._tb_writer = None

    # ------------------------------------------------------------- scalars

    def log_metric(self, metric_name: str, value: Any) -> None:
        self.metrics.setdefault(metric_name, []).append(float(value))
        if self._tb_writer is not None:
            import tensorflow as tf

            with self._tb_writer.as_default():
                tf.summary.scalar(
                    metric_name, float(value), step=len(self.metrics[metric_name])
                )

    def log_temp_metric(self, metric_name: str, value: Any) -> None:
        self.temp_metrics.setdefault(metric_name, []).append(float(value))

    def save_temp_metric(self, metric_name: Union[Iterable[str], str]) -> Dict[str, float]:
        """Average accumulated temp metrics into the main streams
        (misc.py:72-99)."""
        names = [metric_name] if isinstance(metric_name, str) else list(metric_name)
        averaged = {}
        for name in names:
            value = float(np.mean(self.temp_metrics[name]))
            self.log_metric(name, value)
            averaged[name] = value
        self.temp_metrics = {}
        self.save()
        return averaged

    def log_hyperparameter(
        self,
        hyperparameter_name: Optional[str] = None,
        value: Any = None,
        hyperparameter_dict: Optional[Dict[str, Any]] = None,
    ) -> None:
        if hyperparameter_name is not None and value is not None:
            self.hyperparameters.setdefault(hyperparameter_name, []).append(str(value))
        if hyperparameter_dict is not None:
            for key, v in hyperparameter_dict.items():
                self.hyperparameters.setdefault(key, []).append(str(v))

    # --------------------------------------------------------------- images

    def save_prediction(self, prediction, name: str) -> None:
        """Save [B, domains, T, H, W] predictions as per-sample horizontal
        frame strips: BF grey, GFP green-tinted, RFP red-tinted
        (misc.py:132-166)."""
        from PIL import Image

        pred = np.asarray(prediction)
        tints = [
            ("bf", (1.0, 1.0, 1.0)),
            ("gfp", (0.0, 1.0, 0.0)),
            ("rfp", (1.0, 0.0, 0.0)),
        ]
        for batch_index in range(pred.shape[0]):
            for domain in range(min(pred.shape[1], 3)):
                suffix, tint = tints[domain]
                frames = pred[batch_index, domain]  # [T, H, W]
                strip = np.concatenate(list(frames), axis=1)  # [H, T*W]
                rgb = np.stack([strip * t for t in tint], axis=-1)
                rgb = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
                Image.fromarray(rgb).save(
                    os.path.join(
                        self.path_plots, f"{name}_{suffix}_{batch_index}.png"
                    )
                )

    # ---------------------------------------------------------- checkpoints

    def save_checkpoint(self, file_name: str, checkpoint) -> str:
        """Save a checkpoint pytree under models/ (misc.py:124-130)."""
        from multi_stylegan_tpu.io.checkpoint import save_checkpoint

        path = os.path.join(self.path_models, file_name)
        save_checkpoint(path, checkpoint)
        return path

    # -------------------------------------------------------------- flushing

    def save(self) -> None:
        with open(
            os.path.join(self.path_hyperparameters, "hyperparameter.txt"), "w"
        ) as f:
            json.dump(self.hyperparameters, f)
        for metric_name, values in self.metrics.items():
            np.save(os.path.join(self.path_metrics, f"{metric_name}.npy"),
                    np.asarray(values))
