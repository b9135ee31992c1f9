"""Hardware stability run (VERDICT r1 item 9): full 256x256 bf16 config,
N steps on the real chip with a NaN watch, a mid-run checkpoint + resume,
and logged throughput.  Writes a JSON artifact (STABILITY.json by default).

Usage:
    python tools/stability_run.py [--steps 300] [--batch 16]
                                  [--out STABILITY.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="STABILITY.json")
    ap.add_argument("--ckpt_dir", default="/tmp/stability_ckpt")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="32px debug config (tool smoke tests).")
    ap.add_argument("--fixture", default="blobs", choices=("blobs", "teacher"),
                    help="teacher: 'real' data from a frozen random "
                         "Generator - realizable target, balanced dynamics "
                         "(VERDICT round-2 item 6)")
    ap.add_argument("--d_lr_scale", type=float, default=1.0,
                    help="Scale the discriminator lr.  <1 weakens D so G "
                         "wins, driving the reference's fake-batch ADA "
                         "heuristic r above target (ada.py:43-52: r>0.6 "
                         "when sign(D(fake))>0) - demonstrates the "
                         "controller RAISING p on hardware, the regime the "
                         "balanced teacher run never enters.")
    ap.add_argument("--ada_r_update", type=int, default=None,
                    help="Override cfg.ada_r_update (p adjusts every N "
                         "fake batches; smaller = faster response).")
    ap.add_argument("--ada_r_target", type=float, default=None,
                    help="Override cfg.ada_r_target (reference default 0.6, "
                         "ada.py:28).  Experiment-only knob: a frozen "
                         "random-init D plateaus at r~0.55 (round-3 "
                         "ADA_RESPONSE_TINY), so forcing the upward-response "
                         "demonstration needs a target BELOW that plateau; "
                         "the shipped default is unchanged.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from multi_stylegan_tpu.data import (
        BatchLoader,
        SyntheticTLFMDataset,
        TeacherTLFMDataset,
    )
    from multi_stylegan_tpu.io.checkpoint import CheckpointManager
    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
    )
    from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step

    if args.tiny:
        from multi_stylegan_tpu.models.config import (
            tiny_discriminator_config,
            tiny_generator_config,
        )

        gcfg = tiny_generator_config(compute_dtype=args.dtype)
        dcfg = tiny_discriminator_config(compute_dtype=args.dtype)
    else:
        gcfg = GeneratorConfig(compute_dtype=args.dtype, remat=False)
        dcfg = DiscriminatorConfig(no_rfp=True, compute_dtype=args.dtype,
                                   remat=False)
    generator, discriminator = Generator(gcfg), Discriminator(dcfg)
    cfg_kw = {}
    if args.ada_r_update is not None:
        cfg_kw["ada_r_update"] = args.ada_r_update
    if args.ada_r_target is not None:
        cfg_kw["ada_r_target"] = args.ada_r_target
    cfg = TrainingConfig(batch_size=args.batch, compute_dtype=args.dtype,
                         lr_discriminator=6e-4 * args.d_lr_scale, **cfg_kw)
    state = create_train_state(jax.random.key(0), generator, discriminator, cfg)
    step_fn = make_train_step(generator, discriminator, cfg,
                              top_k_start_iteration=50,
                              top_k_final_iteration=200)
    from multi_stylegan_tpu.train.loop import _robust_pl_step

    main_step = jax.jit(step_fn.main_step, donate_argnums=(0,))
    r1 = jax.jit(step_fn.r1_update, donate_argnums=(0,))
    pl = _robust_pl_step(step_fn)  # fused -> split -> warn+skip (infra)
    lazy = cfg.lazy_discriminator_regularization

    if args.fixture == "teacher":
        fixture = TeacherTLFMDataset(
            n_samples=max(256, args.batch * 8), resolution=gcfg.resolution,
            compute_dtype=args.dtype, batch=args.batch,
        )
    else:
        fixture = SyntheticTLFMDataset(n_samples=max(64, args.batch * 4),
                                       resolution=gcfg.resolution)
    data = BatchLoader(fixture, batch_size=args.batch, seed=0, num_workers=1)
    batches = iter(_cycle(data))
    on, off = jnp.asarray(True), jnp.asarray(False)
    # scratch checkpoints: stale state from a previous run (possibly an
    # older TrainState structure) must not be restorable
    import shutil

    shutil.rmtree(args.ckpt_dir, ignore_errors=True)
    ckpt = CheckpointManager(args.ckpt_dir, max_to_keep=2)

    report = {
        "config": {"steps": args.steps, "batch": args.batch,
                   "dtype": args.dtype, "resolution": list(gcfg.resolution),
                   "fixture": args.fixture, "d_lr_scale": args.d_lr_scale,
                   "ada_r_update": cfg.ada_r_update,
                   "ada_r_target": cfg.ada_r_target},
        "device": jax.devices()[0].device_kind,
        "events": [],
        "nan_steps": [],
        "seqs_per_sec": None,
        "ok": False,
    }

    log_every = min(25, max(1, args.steps // 10))

    def run_steps(state, start, n, t_log):
        nonlocal report
        for i in range(start, start + n):
            batch = jnp.asarray(next(batches))
            flags = StepFlags(
                wrong_order=off, trap_weight=off,
                do_cut_mix=jnp.asarray(i % 5 == 0),  # exercise the branch
                do_ema=jnp.asarray(i % cfg.lazy_generator_regularization != 0),
            )
            state, metrics = main_step(state, batch, flags)
            if i % lazy == 0:
                state, _ = r1(state, batch)
                state, _, _ = pl(state)
            if i % log_every == 0 or i == start + n - 1:
                # host fetch = real barrier + NaN watch
                host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                bad = [k for k, v in host.items() if not np.isfinite(v)]
                if bad:
                    report["nan_steps"].append({"step": i, "metrics": bad})
                t_log.append((i, time.perf_counter(),
                              host.get("loss_generator"),
                              host.get("loss_discriminator_real"),
                              host.get("ada_p"), host.get("ada_r")))
                print(f"step {i}: G={host.get('loss_generator'):.3f} "
                      f"D={host.get('loss_discriminator_real'):.3f} "
                      f"ada_p={host.get('ada_p'):.3f} "
                      f"ada_r={host.get('ada_r', float('nan')):.3f}", flush=True)
        return state

    t_log = []
    t0 = time.perf_counter()
    half = args.steps // 2
    state = run_steps(state, 1, half, t_log)

    # mid-run checkpoint + restore into a FRESH (abstract) state template.
    # The template must be ShapeDtypeStructs and the live state must be
    # dropped first: materializing a second full state next to the training
    # programs' reservations OOMs the chip.
    step_saved = int(jax.device_get(state.step))
    ckpt.save(step_saved, state)
    report["events"].append(f"checkpointed at step {step_saved}")
    template = jax.eval_shape(
        lambda: create_train_state(jax.random.key(0), generator, discriminator, cfg)
    )
    del state
    state = ckpt.restore(template)
    assert int(jax.device_get(state.step)) == step_saved
    report["events"].append(f"restored at step {step_saved}")

    state = run_steps(state, half + 1, args.steps - half, t_log)
    wall = time.perf_counter() - t0

    # throughput from the steady-state tail (skip the first logged window)
    if len(t_log) >= 3:
        (i0, s0, *_), (i1, s1, *_) = t_log[1], t_log[-1]
        report["seqs_per_sec"] = round(args.batch * (i1 - i0) / (s1 - s0), 3)
    report["wall_s"] = round(wall, 1)
    report["final_step"] = int(jax.device_get(state.step))
    report["trace"] = [
        {"step": i, "g": g, "d": d, "ada_p": p, "ada_r": r}
        for i, _, g, d, p, r in t_log
    ]
    report["loss_tail"] = report["trace"][-4:]
    ada_ps = [p for *_, p, _ in t_log if p is not None]
    report["ada_p_range"] = [min(ada_ps), max(ada_ps)] if ada_ps else None
    # params must end finite (metrics can hide poisoned samples via top-k)
    bad_params = []
    for group in ("g_params", "d_params", "g_ema_params"):
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                getattr(state, group)):
            if not np.isfinite(np.asarray(jax.device_get(leaf))).all():
                bad_params.append(group + "/" + "/".join(str(k) for k in path))
    report["nonfinite_params"] = bad_params[:20]
    report["ok"] = (not report["nan_steps"] and not bad_params
                    and report["final_step"] == args.steps)
    ckpt.close()
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("ok", "seqs_per_sec", "final_step", "wall_s")}))


def _cycle(loader):
    while True:
        for b in loader:
            yield b


if __name__ == "__main__":
    main()
