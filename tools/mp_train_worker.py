"""Multi-PROCESS data-parallel worker (true multi-host input path).

The reference distributes with single-process ``nn.DataParallel``
(reference train_multi_stylegan.py:67-70); this framework's multi-host
story is ``parallel.per_host_batch`` (make_array_from_process_local_data)
feeding a mesh-sharded train step (SURVEY.md §2.5).  Round-2 VERDICT
flagged that path as "single-process-proven only".  This worker closes the
gap without TPU pods: N coordinated CPU processes (jax.distributed +
Gloo collectives), each holding 2 virtual devices and contributing its
local slice of the global batch.

Run one worker per process (spawned by tests/test_multihost.py):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      python tools/mp_train_worker.py --process_id 0 --num_processes 2 \
        --port 56791 --out /tmp/w0.json

Each worker verifies per_host_batch assembly against the full global batch
(process-major order), runs ONE all-branches-on train step, and writes its
metrics + parameter checksums as one JSON file for the test to cross-check
against a single-process run of the identical program.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_setup():
    """Deterministic (models, cfg, state0, step_fn, global_batch, flags).

    Shared by every worker AND by the single-process reference run in
    tests/test_multihost.py — any drift between the two would invalidate
    the equivalence check, so there is exactly one copy.
    """
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.models import (
        Discriminator,
        Generator,
        tiny_discriminator_config,
        tiny_generator_config,
    )
    from multi_stylegan_tpu.models.config import TrainingConfig
    from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step

    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=8, ada_r_update=1, ada_p_init=0.5)
    state0 = create_train_state(jax.random.key(4), g, d, cfg)
    trap = jnp.ones(gcfg.resolution, jnp.float32)
    step_fn = make_train_step(g, d, cfg, top_k_start_iteration=0,
                              top_k_final_iteration=2, trap_weights_map=trap)
    batch = jax.random.uniform(jax.random.key(5), (8, 2, 3, 32, 32))
    on = jnp.asarray(True)
    flags = StepFlags(wrong_order=on, trap_weight=on, do_cut_mix=on, do_ema=on)
    return state0, step_fn, batch, flags


def build_validation_setup():
    """Deterministic (real batches, generator_apply) for the 2-process
    validation check — one copy shared by the workers and the
    single-process reference in tests/test_multihost.py.

    The generator stand-in is a pure function of z (fixed projection), so
    every process regenerates identical fake batches from the metric's
    seeded ``_fake_batches`` stream.

    Real batches are 8 sequences so the global batch divides the mesh's
    data axis at every tested topology (2 procs x 2 devices and 4 x 2 -
    the 4-process run flushed out exactly this divisibility assumption,
    VERDICT r4 item 5)."""
    import jax
    import jax.numpy as jnp

    res = 32
    reals = [
        jax.random.uniform(jax.random.key(10 + i), (8, 2, 3, res, res))
        for i in range(2)
    ]
    proj = jax.random.normal(
        jax.random.key(20), (512, 2 * 3 * res * res)) / 512**0.5

    def fake_gen(z, z2, rng):
        del z2, rng
        return jnp.tanh(z @ proj).reshape(z.shape[0], 2, 3, res, res) * 0.5 + 0.5

    return reals, fake_gen


def checksums(state):
    """Order-stable per-group |param| sums.

    Computed on device with a replicated output: host-side ``np.asarray``
    would fail on TP-sharded leaves in a multi-process run (the model-axis
    shards of a leaf need not all be addressable from one process)."""
    import jax
    import jax.numpy as jnp

    out = {}
    for group in ("g_params", "d_params", "g_ema_params"):
        leaves = jax.tree.leaves(getattr(state, group))
        total = jax.jit(
            lambda ls: sum(jnp.sum(jnp.abs(l)) for l in ls)
        )(leaves)
        out[group] = float(total)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--light", action="store_true",
                    help="skip the train step: prove batch assembly + "
                         "state replication + a cross-process reduction "
                         "only (fast-suite variant)")
    ap.add_argument("--validation", action="store_true",
                    help="run the Trainer.validation()-shaped metric "
                         "collection (FID + FVD, random weights) over "
                         "globally-sharded real batches — the "
                         "non-addressable-shards path in eval/metrics.py "
                         "(_as_local/_to_host)")
    ap.add_argument("--model_parallel", type=int, default=1,
                    help="mesh 'model' axis size: >1 TP-shards conv kernels "
                         "column-parallel ACROSS the coordinated processes "
                         "(parallel.state_shardings)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env var
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import jax.numpy as jnp
    import numpy as np

    from multi_stylegan_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        per_host_batch,
        process_barrier,
        replicate_state,
        replicated,
        shard_state,
        state_shardings,
        warmup_collectives,
    )

    assert jax.process_count() == args.num_processes

    if args.validation:
        from multi_stylegan_tpu.eval.metrics import FID, FVD

        mesh = make_mesh()
        warmup_collectives(mesh)
        reals, fake_gen = build_validation_setup()
        per = reals[0].shape[0] // args.num_processes
        global_batches = [
            per_host_batch(mesh, np.asarray(r)[args.process_id * per:
                                               (args.process_id + 1) * per])
            for r in reals
        ]
        assert not global_batches[0].is_fully_addressable, (
            "test precondition: batches must have non-addressable shards"
        )
        # data_samples=12 spans both real batches, so the multi-batch
        # collection loop runs over non-addressable shards.
        fid = FID(allow_random_weights=True, batch_size=4, data_samples=12)
        fid_scores = fid(generator_apply=fake_gen, dataset=global_batches)
        fvd = FVD(allow_random_weights=True, batch_size=4, data_samples=12)
        fvd_scores = fvd(generator_apply=fake_gen, dataset=global_batches)
        result = {
            "process_id": args.process_id,
            "process_count": jax.process_count(),
            "global_devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "fid": [float(s) for s in fid_scores],
            "fvd": [float(s) for s in fvd_scores],
        }
        with open(args.out, "w") as f:
            json.dump(result, f)
        print(json.dumps(result), flush=True)
        return

    state0, step_fn, batch, flags = build_setup()
    global_batch = np.asarray(batch)
    per_proc = global_batch.shape[0] // args.num_processes
    local = global_batch[args.process_id * per_proc:
                         (args.process_id + 1) * per_proc]

    mesh = make_mesh(n_model=args.model_parallel)
    warmup_collectives(mesh)  # pin the full-mesh Gloo clique while aligned
    batch_g = per_host_batch(mesh, local)
    assert batch_g.shape == global_batch.shape, (batch_g.shape, global_batch.shape)

    # Assembly check: gather the global array back and compare bit-exactly
    # with the full batch (process-major order is the per_host_batch
    # contract the input pipeline relies on).
    gathered = np.asarray(
        jax.jit(lambda x: x, out_shardings=replicated(mesh))(batch_g))
    np.testing.assert_array_equal(gathered, global_batch)

    if args.model_parallel > 1:
        from jax.sharding import PartitionSpec

        ssh = state_shardings(mesh, state0)
        n_tp = sum(1 for leaf in jax.tree.leaves(ssh)
                   if leaf.spec != PartitionSpec())
        assert n_tp > 0, "TP requested but no leaf was TP-sharded"
        state_r = shard_state(mesh, state0, ssh)
    else:
        ssh, n_tp = None, 0
        state_r = replicate_state(mesh, state0)
    if args.light:
        # Cheap cross-process program: global batch mean + replicated-state
        # checksum through one jitted reduction (exercises Gloo collectives
        # and the replicated-state sharding without the full step compile).
        batch_mean, g_sum = jax.jit(
            lambda s, b: (b.mean(), sum(jnp.sum(jnp.abs(l)) for l in
                                        jax.tree.leaves(s.g_params))),
            out_shardings=(replicated(mesh), replicated(mesh)))(state_r, batch_g)
        result = {
            "process_id": args.process_id,
            "process_count": jax.process_count(),
            "global_devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "batch_mean": float(batch_mean),
            "g_param_abs_sum": float(g_sum),
        }
        with open(args.out, "w") as f:
            json.dump(result, f)
        print(json.dumps(result), flush=True)
        return

    sharded_step = make_sharded_train_step(step_fn, mesh, donate=False,
                                           state_sharding=ssh)
    state1, metrics = sharded_step(state_r, batch_g, flags)
    result = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "mesh_shape": dict(mesh.shape),
        "tp_leaves": n_tp,
        "metrics": {k: float(v) for k, v in metrics.items()},
        "checksums": checksums(state1),
        "ada_p": float(state1.ada.p),
        "ada_last_r": float(state1.ada.last_r),
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
