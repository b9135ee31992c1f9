"""Checkpoint exporter CLI: native orbax TrainState -> reference-format ``.pt``.

The reverse of ``cli.convert``: a framework-trained checkpoint becomes a
6-key ``torch.save`` dict the reference's own resume path accepts verbatim
(reference train_multi_stylegan.py:73-86 loads generator / generator_ema /
discriminator / both Adam state_dicts / path_length_regularization), so a
user can move a TPU-trained model back into the PyTorch tooling:

    python -m multi_stylegan_tpu.cli.export runs/exp/checkpoints checkpoint_100.pt

Params, EMA, and Adam moments all transfer exactly (the mapping is pure
layout both ways, tests/test_export.py); the reference's own checkpoint
format cannot carry the path-length running mean, ADA p/r, or the step
counter (it loses them on resume too), so those stay native-only.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("source", type=str,
                        help="Orbax checkpoint dir (a single save_checkpoint "
                             "dir, or a CheckpointManager root - latest step "
                             "is taken).")
    parser.add_argument("dest", type=str, help="Output .pt path.")
    parser.add_argument("--compat_tower2_bug", default=False,
                        action="store_true",
                        help="Source config used the reference's tower-2 "
                             "output wiring.")
    parser.add_argument("--tiny", default=False, action="store_true",
                        help="Use the 32px debug config (tests).")
    parser.add_argument("--platform", default=None, type=str)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import torch

    from multi_stylegan_tpu.io.checkpoint import CheckpointManager, load_checkpoint
    from multi_stylegan_tpu.io.torch_convert import export_reference_checkpoint
    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
        tiny_discriminator_config,
        tiny_generator_config,
    )
    from multi_stylegan_tpu.train import create_train_state
    from multi_stylegan_tpu.train.state import extract_adam_moments

    if args.tiny:
        gcfg = tiny_generator_config(
            compat_tower2_output_bug=args.compat_tower2_bug)
        dcfg = tiny_discriminator_config()
    else:
        gcfg = GeneratorConfig(compat_tower2_output_bug=args.compat_tower2_bug)
        dcfg = DiscriminatorConfig(no_rfp=True)
    tcfg = TrainingConfig()

    template = create_train_state(
        jax.random.key(0), Generator(gcfg), Discriminator(dcfg), tcfg)
    source = os.path.abspath(args.source)
    try:
        state = load_checkpoint(source, template)
    except Exception:
        mgr = CheckpointManager(source)
        if mgr.latest_step() is None:
            raise SystemExit(f"no checkpoint found under {source}")
        state = mgr.restore(template)

    ckpt = export_reference_checkpoint(
        state.g_params, state.g_noises, state.g_ema_params, state.d_params,
        gcfg, dcfg,
        g_adam=extract_adam_moments(state.g_opt_state),
        d_adam=extract_adam_moments(state.d_opt_state),
        lr_generator=tcfg.lr_generator,
        lr_discriminator=tcfg.lr_discriminator,
        lr_style_factor=tcfg.lr_style_factor,
        adam_betas=(tcfg.adam_beta1, tcfg.adam_beta2),
    )
    dest = os.path.abspath(args.dest)
    torch.save(ckpt, dest)
    print(f"Exported {source} -> {dest} (reference 6-key format, "
          f"Adam count={extract_adam_moments(state.g_opt_state)['count']})")


if __name__ == "__main__":
    main()
