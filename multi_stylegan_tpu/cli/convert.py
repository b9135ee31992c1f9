"""Checkpoint converter CLI: published reference ``.pt`` -> orbax TrainState.

The reference ships 6-key ``torch.save`` checkpoints (reference README.md:
104-111).  This command produces a framework-native orbax checkpoint a user
can resume or sample from directly:

    python -m multi_stylegan_tpu.cli.convert checkpoint_100.pt out_dir/
    python -m multi_stylegan_tpu.cli.train --load_checkpoint out_dir
    python -m multi_stylegan_tpu.cli.sample --checkpoint out_dir ...

Generator/EMA/discriminator params, the path-length running mean, AND the
torch Adam moments (when the .pt carries the optimizer state_dicts, as the
reference's own checkpoints do — train_multi_stylegan.py:80-81) are all
converted; the param mapping is pure layout, so moments transfer exactly
(io/torch_convert.py::convert_adam_state).
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("source", type=str, help="Reference .pt checkpoint.")
    parser.add_argument("dest", type=str, help="Output orbax checkpoint dir.")
    parser.add_argument("--step", default=0, type=int,
                        help="Step counter to stamp into the state (the "
                             "reference does not checkpoint it).")
    parser.add_argument("--compat_tower2_bug", default=False, action="store_true",
                        help="Target config reproduces the reference's "
                             "tower-2 output wiring (published checkpoints "
                             "were trained with it).")
    parser.add_argument("--tiny", default=False, action="store_true",
                        help="Use the 32px debug config (tests).")
    parser.add_argument("--platform", default=None, type=str)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from multi_stylegan_tpu.io import convert_reference_checkpoint, save_checkpoint
    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
        tiny_discriminator_config,
        tiny_generator_config,
    )
    from multi_stylegan_tpu.train import create_train_state

    if args.tiny:
        gcfg = tiny_generator_config(
            compat_tower2_output_bug=args.compat_tower2_bug)
        dcfg = tiny_discriminator_config()
    else:
        gcfg = GeneratorConfig(compat_tower2_output_bug=args.compat_tower2_bug)
        dcfg = DiscriminatorConfig(no_rfp=True)
    converted = convert_reference_checkpoint(args.source, gcfg, dcfg)

    state = create_train_state(
        jax.random.key(0), Generator(gcfg), Discriminator(dcfg), TrainingConfig()
    )
    state = state.replace(
        step=jnp.asarray(args.step, state.step.dtype),
        g_params=jax.tree.map(jnp.asarray, converted["generator"]["params"]),
        g_ema_params=jax.tree.map(jnp.asarray, converted["generator_ema"]["params"]),
        g_noises=jax.tree.map(jnp.asarray, converted["generator"]["noises"]),
        d_params=jax.tree.map(jnp.asarray, converted["discriminator"]["params"]),
    )
    if "mean_path_length" in converted:
        state = state.replace(
            mean_path_length=jnp.asarray(converted["mean_path_length"])
        )
    # The reference checkpoint carries both torch Adam state_dicts and the
    # reference restores them on resume (train_multi_stylegan.py:80-81);
    # the layout-pure conversion transfers the moments exactly.
    from multi_stylegan_tpu.train.state import install_adam_moments

    moments = []
    if "generator_adam" in converted:
        state = state.replace(g_opt_state=install_adam_moments(
            state.g_opt_state, **converted["generator_adam"]))
        moments.append("G")
    if "discriminator_adam" in converted:
        state = state.replace(d_opt_state=install_adam_moments(
            state.d_opt_state, **converted["discriminator_adam"]))
        moments.append("D")
    dest = os.path.abspath(args.dest)
    save_checkpoint(dest, state)
    note = (f"{'/'.join(moments)} Adam moments converted" if moments
            else "no optimizer state in the .pt; moments re-initialized")
    print(f"Converted {args.source} -> {dest} ({note}, step={args.step})")


if __name__ == "__main__":
    main()
