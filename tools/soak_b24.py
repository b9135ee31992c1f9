"""Reference-regime soak at batch 24 (VERDICT round-4 item 2).

The reference trains at batch 24 (train_multi_stylegan.py:7-8, README.md:128);
before this artifact the regime had only executed for 16 bench steps
(PERF.md round-4 sweep: b24/full-remat, 13.87 seqs/s, MFU 0.671).  This tool
drives the REAL ``Trainer`` path (train/loop.py — the same construction as
``cli.train``: mesh, sharded BatchLoader, Logger, CheckpointManager,
validation metrics) at the flagship 256px config, batch 24, full remat,
against the teacher fixture, for ~1-2k steps in two phases:

  phase A: a fresh Trainer for the first half of the epochs — R1 /
           path-length / cut-mix / ADA firing on their reference cadences,
           per-epoch sample grids, periodic orbax checkpoints, one
           reduced-sample validation pass at the end of the phase.
  phase B: a NEW Trainer with ``resume_training=True`` restoring the
           latest phase-A checkpoint (``Trainer.restore_latest``) — the
           reference's own resume workflow (train_multi_stylegan.py
           --load_checkpoint + --resume_training: cut-mix p=0.5,
           wrong-order on, top-k collapsed, model_wrapper.py:121-123) —
           for the second half, ending in another validation pass.

Writes SOAK_B24.json: losses/ADA trace, per-epoch seqs/sec, events
(checkpoints, restore, validation scores), NaN watch over every logged
metric, and a final params-finiteness sweep.  ``ok`` requires zero
non-finite metrics, finite params, and the full step count.

Usage:
    python tools/soak_b24.py [--epochs 50] [--steps_per_epoch 24]
                             [--out SOAK_B24.json] [--tiny] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _guarded(metric, events):
    """Wrap a validation metric so an eval-time failure (e.g. device OOM
    with the training programs resident) is recorded as an event instead of
    killing the soak; keeps the metric's type name for Trainer.validation's
    logging."""

    class Guarded(type(metric)):
        def __init__(self):  # pragma: no cover - state copied below
            pass

        def __call__(self, *a, **k):
            t0 = time.perf_counter()
            try:
                out = super().__call__(*a, **k)
                events.append(
                    {"event": f"validation {type(metric).__name__}",
                     "scores": [float(s) for s in (
                         out if hasattr(out, "__len__") else [out])],
                     "wall_s": round(time.perf_counter() - t0, 1)})
                return out
            except Exception as exc:
                events.append(
                    {"event": f"validation {type(metric).__name__} FAILED",
                     "error": f"{type(exc).__name__}: {exc}"[:300]})
                return [float("inf")] * 2

    Guarded.__name__ = type(metric).__name__
    Guarded.__qualname__ = type(metric).__name__
    g = Guarded()
    g.__dict__.update(metric.__dict__)
    return g


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50,
                    help="TOTAL epochs across both phases (half each).")
    ap.add_argument("--steps_per_epoch", type=int, default=24)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="SOAK_B24.json")
    ap.add_argument("--workdir", default="/tmp/soak_b24")
    ap.add_argument("--val_samples", type=int, default=240,
                    help="Reduced validation sample count (protocol is 5000; "
                         "scores use random feature weights here - the run "
                         "proves the pipeline, VALIDATION.json proves scale).")
    ap.add_argument("--val_batch", type=int, default=8)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--pl_start_tier", default=None,
                    help="Pin the path-length ladder's start tier (e.g. "
                         "'chunked5' = full chunking at b24).  The probe "
                         "(tools/probe_b24_regs.py) shows every PL tier "
                         "executing at b24 in isolation, but in the full "
                         "Trainer context the shallow chunk tiers OOM'd and "
                         "the first OOM can wedge the allocator - starting "
                         "at a tier that FITS avoids ever OOMing.")
    ap.add_argument("--tiny", action="store_true",
                    help="32px debug config (tool smoke test).")
    ap.add_argument("--phase", default="both", choices=("both", "a", "b"),
                    help="'both' runs phase A and phase B as SEPARATE "
                         "processes: the reference's actual resume workflow "
                         "(a new process restores the checkpoint), and the "
                         "only way phase A's device memory is fully "
                         "released before phase B allocates its fresh "
                         "state (round-5: in-process phase B OOM'd at "
                         "optimizer-moment init).")
    args = ap.parse_args()

    if args.phase == "both":
        import subprocess

        argv = sys.argv[1:]
        for ph in ("a", "b"):
            cmd = [sys.executable, os.path.abspath(__file__),
                   *[a for a in argv if a not in ("--phase", "both")],
                   "--phase", ph]
            rc = subprocess.call(cmd)
            if rc != 0:
                sys.exit(rc)
        return

    import jax
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform != "cpu":
        # the persistent cache is for the TPU path; XLA:CPU AOT
        # entries can hard-abort on machine-feature mismatch
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.jax_cache")

    from multi_stylegan_tpu.data import BatchLoader, TeacherTLFMDataset
    from multi_stylegan_tpu.eval import FID, FVD, IS
    from multi_stylegan_tpu.io import Logger
    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
        tiny_discriminator_config,
        tiny_generator_config,
    )
    from multi_stylegan_tpu.parallel import batch_sharding, make_mesh
    from multi_stylegan_tpu.train.loop import Trainer

    # full remat: the measured one-chip b24 regime (PERF.md round-4 sweep -
    # no-remat OOMs, selective-128 OOMs at execution; full remat executes)
    remat_kw = dict(remat=True, remat_min_px=0)
    if args.tiny:
        gcfg = tiny_generator_config(compute_dtype=args.dtype, **remat_kw)
        dcfg = tiny_discriminator_config(compute_dtype=args.dtype, **remat_kw)
    else:
        gcfg = GeneratorConfig(compute_dtype=args.dtype, **remat_kw)
        dcfg = DiscriminatorConfig(no_rfp=True, compute_dtype=args.dtype,
                                   **remat_kw)

    if args.phase == "a":
        shutil.rmtree(args.workdir, ignore_errors=True)
    ckpt_dir = os.path.join(args.workdir, "ckpt")
    half = args.epochs // 2

    events = []
    # surface Trainer RuntimeWarnings (guarded ckpt/grid failures, PL
    # exclusion) in the artifact, not only on stderr
    import warnings

    _orig_show = warnings.showwarning

    def _warn_hook(message, category, filename, lineno, file=None, line=None):
        events.append({"event": "warning", "message": str(message)[:300]})
        _orig_show(message, category, filename, lineno, file, line)

    warnings.showwarning = _warn_hook
    if args.phase == "b" and os.path.exists(args.out):
        # continue the phase-A report (fresh process, same artifact)
        with open(args.out) as f:
            report = json.load(f)
        events.extend(report.get("events", ()))
        report["events"] = events
    else:
        report = {
            "config": {"batch": args.batch, "dtype": args.dtype,
                       "resolution": list(gcfg.resolution),
                       "remat": "full", "epochs": args.epochs,
                       "steps_per_epoch": args.steps_per_epoch,
                       "fixture": "teacher",
                       "val_samples": args.val_samples},
            "device": jax.devices()[0].device_kind,
            "events": events,
            "nan_metrics": [],
            "ok": False,
        }

    fixture = TeacherTLFMDataset(
        n_samples=args.batch * args.steps_per_epoch,
        resolution=gcfg.resolution, compute_dtype=args.dtype,
        batch=min(args.batch, 8),
    )
    mesh = make_mesh()
    metrics_kw = dict(batch_size=args.val_batch,
                      data_samples=args.val_samples,
                      latent_dimensions=gcfg.latent_dimensions,
                      allow_random_weights=True)

    def build_trainer(resume: bool, epochs: int, tag: str):
        cfg = TrainingConfig(batch_size=args.batch, epochs=args.epochs,
                             compute_dtype=args.dtype,
                             resume_training=resume, seed=0,
                             # one reduced validation pass per phase, at the
                             # phase end; checkpoints on the default cadence
                             validate_every_n_epochs=epochs,
                             checkpoint_every_n_epochs=min(
                                 5, max(1, epochs // 2)))
        generator, discriminator = Generator(gcfg), Discriminator(dcfg)
        loader = BatchLoader(fixture, batch_size=args.batch, seed=0,
                             sharding=batch_sharding(mesh))
        logger = Logger(experiment_path=os.path.join(args.workdir, tag))
        val = tuple(_guarded(m(**metrics_kw), events)
                    for m in (FID, FVD, IS))
        trainer = Trainer(generator, discriminator, cfg,
                          training_dataset=loader, data_logger=logger,
                          validation_metrics=val, mesh=mesh,
                          checkpoint_dir=ckpt_dir, epochs=epochs)
        if args.pl_start_tier:
            # eval_shape (NOT io.checkpoint.abstract_template, which yields
            # the raw uint32[2] key representation and mis-keys the AOT
            # signature) preserves the typed key<fry> aval
            abstract = jax.eval_shape(lambda s: s, trainer.state)
            tier = trainer.pl_step.prepare(abstract,
                                           start_tier=args.pl_start_tier)
            events.append({"event": f"{tag} pl tier pinned", "tier": tier})
        return trainer

    def harvest(trainer, tag, wall_s):
        m = trainer.logger.metrics
        steps = len(m.get("loss_generator", ()))
        trace = [
            {"step": i,
             "g": round(m["loss_generator"][i], 4),
             "d": round(m["loss_discriminator_real"][i], 4),
             "ada_p": round(m["ada_p"][i], 4) if "ada_p" in m else None,
             "ada_r": round(m["ada_r"][i], 4) if "ada_r" in m else None}
            for i in range(0, steps, max(1, steps // 40))
        ]
        bad = sorted(
            name for name, vals in m.items()
            if not np.all(np.isfinite(np.asarray(vals, dtype=np.float64))))
        report["nan_metrics"].extend(f"{tag}/{b}" for b in bad)
        report[tag] = {
            "steps": steps, "wall_s": round(wall_s, 1),
            "seqs_per_sec": [round(v, 2) for v in m.get("seqs_per_sec", ())],
            "trace": trace,
            "loss_tail": trace[-3:],
        }
        return steps

    # ----------------------------------------------------------- phase A
    if args.phase == "a":
        t0 = time.perf_counter()
        trainer = build_trainer(resume=False, epochs=half, tag="phase_a")
        events.append({"event": "phase A start",
                       "main_mode": trainer.main_step.mode()})
        trainer.train()
        events.append({"event": "phase A done",
                       "main_mode": trainer.main_step.mode(),
                       # 'fused'/'split'/'chunkedN' = PL firing; 'excluded'
                       # = the degraded compile helper rejected every
                       # second-order tier and training continued without
                       # it (train/robust.py)
                       "pl_mode": trainer.pl_step.mode["m"]})
        harvest(trainer, "phase_a", time.perf_counter() - t0)
        saved_step = trainer.ckpt.latest_step()
        events.append({"event": "latest checkpoint", "step": saved_step})
        trainer.ckpt.close()
        # partial artifact: a phase-B crash must not erase phase A's
        # evidence; phase B (a fresh process) continues from this file
        report["partial"] = "phase A complete"
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps({"phase": "a", "steps": report["phase_a"]["steps"],
                          "checkpoint": saved_step}))
        return

    # ----------------------------------------------------------- phase B
    # The reference resume workflow, literally: a NEW process restores the
    # checkpoint and continues under the resume schedules (cut-mix p=0.5,
    # wrong-order on, top-k collapsed - model_wrapper.py:121-123, 272, 331).
    # A fresh process is also the only way phase A's device memory is fully
    # released before this phase allocates its own state.
    steps_a = (report.get("phase_a") or {}).get("steps", 0)
    t0 = time.perf_counter()
    trainer = build_trainer(resume=True, epochs=args.epochs - half,
                            tag="phase_b")
    saved_step = trainer.ckpt.latest_step()
    restored = trainer.restore_latest()
    assert restored, "phase B found no checkpoint to restore"
    got = int(jax.device_get(trainer.state.step))
    events.append({"event": "restored", "step": got})
    assert got == saved_step, (got, saved_step)
    trainer.train()
    events.append({"event": "phase B done",
                   "main_mode": trainer.main_step.mode(),
                   "pl_mode": trainer.pl_step.mode["m"]})
    steps_b = harvest(trainer, "phase_b", time.perf_counter() - t0)

    # final params finiteness (metrics can mask poisoned samples via top-k)
    bad_params = []
    for group in ("g_params", "d_params", "g_ema_params"):
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                getattr(trainer.state, group)):
            if not np.isfinite(np.asarray(jax.device_get(leaf))).all():
                bad_params.append(group + "/" + "/".join(
                    str(k) for k in path))
    report["nonfinite_params"] = bad_params[:20]
    report["final_step"] = int(jax.device_get(trainer.state.step))
    trainer.ckpt.close()

    # phase B replays from the last SUCCESSFUL checkpoint (a guarded save
    # failure means restoring earlier), so the expected final step is
    # restore point + phase-B work, not necessarily epochs*steps_per_epoch
    expected = (saved_step or 0) + (args.epochs - half) * args.steps_per_epoch
    report.pop("partial", None)
    report["total_steps"] = steps_a + steps_b
    report["ok"] = (not report["nan_metrics"] and not bad_params
                    and report["final_step"] == expected)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("ok", "total_steps", "final_step")}))


if __name__ == "__main__":
    main()
