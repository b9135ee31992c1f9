"""Training CLI - flag parity with reference train_multi_stylegan.py:4-28.

Example:
    python -m multi_stylegan_tpu.cli.train --path_to_data /data/tlfm \\
        --batch_size 24 --epochs 100

TPU-native replacements for the reference's CUDA flags:
  --cuda_devices  -> --devices (number of mesh devices; default: all)
  --data_parallel -> mesh data-parallelism is always available; a 1-device
                     mesh is the degenerate case.
Additional flags: --synthetic (fixture data), --tiny (32px debug config),
--experiment_path, --seed, --compat_tower2_bug.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--devices", default=None, type=int,
                        help="Number of devices in the data-parallel mesh (default: all).")
    parser.add_argument("--model_parallel", default=1, type=int,
                        help="Tensor-parallel size (mesh 'model' axis): conv "
                             "kernels/optimizer moments shard their "
                             "output-channel dim column-parallel; 1 = pure DP "
                             "(the reference's regime).")
    parser.add_argument("--batch_size", default=24, type=int,
                        help="Batch size to be utilized while training.")
    parser.add_argument("--epochs", default=100, type=int,
                        help="Number of epochs to perform while training.")
    parser.add_argument("--lr_generator", default=2e-04, type=float,
                        help="Learning rate of the generator network.")
    parser.add_argument("--lr_discriminator", default=6e-04, type=float,
                        help="Learning rate of the discriminator network.")
    parser.add_argument("--path_to_data", default="./60x_10BF_200GFP_200RFP20_3Z_10min",
                        type=str, help="Path to dataset.")
    parser.add_argument("--load_checkpoint", default="", type=str,
                        help="Path to checkpoint to be loaded (orbax dir or reference .pt).")
    parser.add_argument("--resume_training", default=False, action="store_true",
                        help="Resume: enables cut-mix/wrong-order/trap regimes immediately.")
    parser.add_argument("--no_top_k", default=False, action="store_true",
                        help="Disable top-k training.")
    parser.add_argument("--no_ada", default=False, action="store_true",
                        help="Disable adaptive discriminator augmentation.")
    parser.add_argument("--synthetic", default=False, action="store_true",
                        help="Train on the synthetic fixture dataset (no data needed).")
    parser.add_argument("--tiny", default=False, action="store_true",
                        help="Use the 32px debug config.")
    parser.add_argument("--experiment_path", default=None, type=str)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--compat_tower2_bug", default=False, action="store_true",
                        help="Reproduce the reference's tower-2 output-block wiring.")
    parser.add_argument("--no_validation_metrics", default=False, action="store_true",
                        help="Skip FID/FVD/IS validation (e.g. without pretrained weights).")
    parser.add_argument("--trap_weights", default=False, action="store_true",
                        help="Apply a trap-region pixel-weight map to the pixel "
                             "losses after trap_weight_start of training "
                             "(the reference accepts such a map but never "
                             "builds one; see data/trap_weights.py).")
    parser.add_argument("--trap_weight_inside", default=2.0, type=float,
                        help="Relative weight of the trap region (map is "
                             "normalized to mean 1).")
    parser.add_argument("--dtype", default="float32", type=str,
                        choices=("float32", "bfloat16"),
                        help="Activation compute dtype (params stay fp32).")
    parser.add_argument("--no_remat", default=False, action="store_true",
                        help="Disable block rematerialization (more memory, "
                             "faster backward; fits at bfloat16).")
    parser.add_argument("--remat_min_px", default=0, type=int,
                        help="Selective remat: only blocks at >= this many "
                             "pixels are rematerialized (0 = all blocks). "
                             "128 fits batch 24 on one chip with less "
                             "recompute than full remat.")
    parser.add_argument("--ada_sequential_warps", default=False,
                        action="store_true",
                        help="Reproduce the reference's four separate ADA "
                             "warps instead of the composed single warp "
                             "(exact reference behavior, 4x the resampling).")
    parser.add_argument("--ada_warp_fwd", default=None, type=str,
                        choices=("gather", "matmul", "matmul_unroll"),
                        help="Override the ADA warp forward implementation "
                             "(default: measured best; see PERF.md 'ADA "
                             "warp adjoint').")
    parser.add_argument("--platform", default=None, type=str,
                        help="Force a jax platform (e.g. 'cpu'); the axon TPU "
                             "plugin ignores JAX_PLATFORMS, this flag works.")
    parser.add_argument("--profile_dir", default=None, type=str,
                        help="Capture a jax.profiler trace of steady-state "
                             "steps 2-5 into this directory (view with "
                             "TensorBoard/xprof).")
    # multi-host launch (one process per host, e.g. a TPU pod slice): every
    # process runs the same command with its own --process_id; data is read
    # per host (BatchLoader loads each process's slice of the global batch),
    # files are written by process 0 only, orbax checkpoints coordinate
    # across hosts. Exercised at process_count=2 by tests/test_multihost.py.
    parser.add_argument("--coordinator_address", default=None, type=str,
                        help="host:port of process 0 for "
                             "jax.distributed.initialize (multi-host).")
    parser.add_argument("--num_processes", default=None, type=int,
                        help="Total number of controller processes.")
    parser.add_argument("--process_id", default=None, type=int,
                        help="This process's index in [0, num_processes).")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.coordinator_address:
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MSG_TPU_CACHE", "/root/.jax_cache"))

    from multi_stylegan_tpu.data import BatchLoader, SyntheticTLFMDataset, TLFMDataset
    from multi_stylegan_tpu.io import Logger
    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
        tiny_discriminator_config,
        tiny_generator_config,
    )
    from multi_stylegan_tpu.parallel import make_mesh, batch_sharding
    from multi_stylegan_tpu.train.loop import Trainer

    if args.ada_warp_fwd:
        from multi_stylegan_tpu.train.ada import set_ada_warp_fwd

        set_ada_warp_fwd(args.ada_warp_fwd)

    remat_kw = dict(remat=not args.no_remat, remat_min_px=args.remat_min_px)
    if args.tiny:
        gcfg = tiny_generator_config(
            compat_tower2_output_bug=args.compat_tower2_bug,
            compute_dtype=args.dtype, **remat_kw)
        dcfg = tiny_discriminator_config(
            compute_dtype=args.dtype, **remat_kw)
    else:
        gcfg = GeneratorConfig(compat_tower2_output_bug=args.compat_tower2_bug,
                               compute_dtype=args.dtype, **remat_kw)
        dcfg = DiscriminatorConfig(no_rfp=True, compute_dtype=args.dtype,
                                   **remat_kw)

    cfg = TrainingConfig(
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr_generator=args.lr_generator,
        lr_discriminator=args.lr_discriminator,
        top_k=not args.no_top_k,
        ada=not args.no_ada,
        ada_sequential_warps=args.ada_sequential_warps,
        resume_training=args.resume_training,
        seed=args.seed,
    )

    print("Init models")
    generator = Generator(gcfg)
    discriminator = Discriminator(dcfg)

    mesh = make_mesh(n_data=args.devices, n_model=args.model_parallel)
    print(f"Mesh: {mesh}")

    print("Init dataset")
    if args.synthetic:
        dataset = SyntheticTLFMDataset(
            n_samples=max(64, args.batch_size * 4), resolution=gcfg.resolution
        )
    else:
        dataset = TLFMDataset(path=args.path_to_data, no_rfp=True)
    loader = BatchLoader(
        dataset, batch_size=args.batch_size, seed=args.seed,
        sharding=batch_sharding(mesh),
    )
    print(f"{len(dataset)} sequences, {len(loader)} steps/epoch")

    logger = Logger(experiment_path=args.experiment_path)
    if jax.process_index() == 0:
        logger.log_hyperparameter(hyperparameter_dict=vars(args))

    metrics = ()
    if not args.no_validation_metrics:
        try:
            from multi_stylegan_tpu.eval import FID, FVD, IS

            metrics = (FID(), FVD(), IS())
        except Exception as exc:  # pretrained weights unavailable
            print(f"Validation metrics disabled: {exc}")

    trap_map = None
    if args.trap_weights:
        from multi_stylegan_tpu.data import make_trap_weights_map

        trap_map = make_trap_weights_map(
            resolution=gcfg.resolution, inside_weight=args.trap_weight_inside
        )

    trainer = Trainer(
        generator, discriminator, cfg,
        training_dataset=loader, data_logger=logger,
        validation_metrics=metrics, trap_weights_map=trap_map,
        mesh=mesh, epochs=args.epochs, profile_dir=args.profile_dir,
    )

    if args.load_checkpoint:
        if args.load_checkpoint.endswith(".pt"):
            from multi_stylegan_tpu.io import convert_reference_checkpoint

            converted = convert_reference_checkpoint(args.load_checkpoint, gcfg, dcfg)
            import jax.numpy as jnp

            self_state = trainer.state
            trainer.state = self_state.replace(
                g_params=jax.tree.map(jnp.asarray, converted["generator"]["params"]),
                g_ema_params=jax.tree.map(
                    jnp.asarray, converted["generator_ema"]["params"]
                ),
                g_noises=jax.tree.map(jnp.asarray, converted["generator"]["noises"]),
                d_params=jax.tree.map(
                    jnp.asarray, converted["discriminator"]["params"]
                ),
            )
            # The reference restores both Adam state_dicts on
            # --load_checkpoint (train_multi_stylegan.py:80-81); moments
            # transfer exactly under the layout conversion.
            from multi_stylegan_tpu.train.state import install_adam_moments

            got_moments = []
            if "generator_adam" in converted:
                trainer.state = trainer.state.replace(
                    g_opt_state=install_adam_moments(
                        trainer.state.g_opt_state, **converted["generator_adam"]))
                got_moments.append("G")
            if "discriminator_adam" in converted:
                trainer.state = trainer.state.replace(
                    d_opt_state=install_adam_moments(
                        trainer.state.d_opt_state,
                        **converted["discriminator_adam"]))
                got_moments.append("D")
            if got_moments:
                print("Loaded reference .pt checkpoint "
                      f"(+ {'/'.join(got_moments)} Adam moments)")
            else:
                print("Loaded reference .pt checkpoint (no optimizer state "
                      "in the .pt; moments start fresh)")
        else:
            trainer.restore_latest()
            print("Restored orbax checkpoint")

    print("Start training")
    trainer.train()


if __name__ == "__main__":
    main()
