"""Validation at protocol scale on the real chip (VERDICT round-3 item 5).

Runs ``Trainer.validation()`` — FID + FVD + IS with ``allow_random_weights``
— at the flagship 256x256 config with the exact reference protocol: 5,000
real + 5,000 fake samples, EMA generator, p_mixed_noise=0-style seeded z
batches (reference validation_metrics.py:164; SURVEY.md §6).  Random
feature weights make the SCORES meaningless (no pretrained blobs in this
environment); what this run proves is that the eval stack executes its real
workload end-to-end on TPU hardware: 15,000 generator samples + 20,000
Inception/I3D forwards through the jitted sample/feature programs, within
device memory.

Writes a JSON artifact with per-metric wall-clock and peak device memory.

Usage:
    python tools/validation_run.py [--out VALIDATION.json] [--batch 24]
                                   [--samples 5000] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(cls):
    """Subclass that records wall-clock per __call__, keeping cls.__name__
    (Trainer.validation logs metrics by type name)."""

    class Timed(cls):
        def __call__(self, *a, **k):
            t0 = time.perf_counter()
            out = super().__call__(*a, **k)
            self.wall_s = round(time.perf_counter() - t0, 1)
            return out

    Timed.__name__ = cls.__name__
    Timed.__qualname__ = cls.__name__
    return Timed


def _mem_stats():
    import jax

    try:
        s = jax.local_devices()[0].memory_stats() or {}
        return {k: s[k] for k in ("bytes_in_use", "peak_bytes_in_use")
                if k in s}
    except Exception:
        return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="VALIDATION.json")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--samples", type=int, default=5000)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="32px config + tiny sample count (tool smoke test)")
    ap.add_argument("--exp_dir", default="/tmp/validation_run_exp")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from multi_stylegan_tpu.data.pipeline import BatchLoader
    from multi_stylegan_tpu.data.synthetic import SyntheticTLFMDataset
    from multi_stylegan_tpu.eval.metrics import FID, FVD, IS
    from multi_stylegan_tpu.io.logger import Logger
    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
        tiny_discriminator_config,
        tiny_generator_config,
    )
    from multi_stylegan_tpu.train.loop import Trainer

    if args.tiny:
        gcfg = tiny_generator_config(compute_dtype=args.dtype)
        dcfg = tiny_discriminator_config(compute_dtype=args.dtype)
        samples = min(args.samples, 32)
        batch = min(args.batch, 8)
    else:
        gcfg = GeneratorConfig(compute_dtype=args.dtype)
        dcfg = DiscriminatorConfig(no_rfp=True, compute_dtype=args.dtype)
        samples, batch = args.samples, args.batch

    generator, discriminator = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=batch, compute_dtype=args.dtype)
    # enough real samples for one full protocol pass, streamed by the loader
    dataset = BatchLoader(
        SyntheticTLFMDataset(n_samples=samples + batch,
                             resolution=gcfg.resolution),
        batch_size=batch, shuffle=False, num_workers=4,
    )
    kw = dict(allow_random_weights=True, batch_size=batch,
              data_samples=samples,
              latent_dimensions=gcfg.latent_dimensions)
    metrics = (_timed(FID)(**kw), _timed(FVD)(**kw), _timed(IS)(**kw))
    trainer = Trainer(
        generator, discriminator, cfg, dataset,
        data_logger=Logger(experiment_path=args.exp_dir),
        validation_metrics=metrics, epochs=1,
    )

    mem0 = _mem_stats()
    t0 = time.perf_counter()
    trainer.validation()
    total_s = round(time.perf_counter() - t0, 1)
    mem1 = _mem_stats()

    logged = {name: vals[-1] for name, vals in trainer.logger.metrics.items()
              if any(name.startswith(m) for m in ("FID", "FVD", "IS"))}
    result = {
        "protocol": {"real_samples": samples, "fake_samples": samples,
                     "batch": batch, "resolution": list(gcfg.resolution),
                     "weights": "random (no pretrained blobs in env; "
                                "scores are plumbing-only)"},
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "dtype": args.dtype,
        "total_wall_s": total_s,
        "per_metric_wall_s": {type(m).__name__: getattr(m, "wall_s", None)
                              for m in metrics},
        "scores": {k: float(v) for k, v in logged.items()},
        "memory_before": mem0,
        "memory_after": mem1,
        "best_fvd_tracked": trainer.best_fvd,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
