"""Sampling CLI - parity with reference scripts/get_gan_samples.py:30-60.

Loads the EMA generator from a checkpoint (orbax train-state dir or the
published reference ``.pt``), draws N samples with ``p_mixed_noise=0`` and
saves per-domain PNG strips (GFP tinted green).
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=False, default="", type=str,
                        help="Checkpoint path (orbax dir or reference .pt). "
                             "Empty = fresh random weights (debug).")
    parser.add_argument("--samples", default=100, type=int)
    parser.add_argument("--output", default="samples", type=str)
    parser.add_argument("--batch_size", default=16, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--tiny", default=False, action="store_true")
    parser.add_argument("--platform", default=None, type=str,
                        help="Force a jax platform (e.g. 'cpu'); the axon TPU "
                             "plugin ignores JAX_PLATFORMS, this flag works.")
    return parser


def load_ema_generator(checkpoint: str, gcfg):
    """Returns (params, noises) for the EMA generator."""
    import jax
    import jax.numpy as jnp

    from multi_stylegan_tpu.models import Generator

    generator = Generator(gcfg)
    if checkpoint.endswith(".pt"):
        from multi_stylegan_tpu.io import convert_reference_checkpoint

        conv = convert_reference_checkpoint(checkpoint, gcfg)
        tree = jax.tree.map(jnp.asarray, conv["generator_ema"])
        return generator, tree["params"], tree["noises"]
    variables = generator.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "mixing": jax.random.key(2)},
        jnp.zeros((1, gcfg.latent_dimensions)),
    )
    if checkpoint:
        from multi_stylegan_tpu.io import load_checkpoint

        raw = load_checkpoint(checkpoint)
        params = raw.get("g_ema_params", raw.get("params", raw))
        noises = raw.get("g_noises", variables["noises"])
        return generator, jax.tree.map(jnp.asarray, params), jax.tree.map(
            jnp.asarray, noises)
    return generator, variables["params"], variables["noises"]


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from multi_stylegan_tpu.io.logger import Logger
    from multi_stylegan_tpu.models.config import GeneratorConfig, tiny_generator_config

    gcfg = tiny_generator_config() if args.tiny else GeneratorConfig()
    generator, params, noises = load_ema_generator(args.checkpoint, gcfg)

    os.makedirs(args.output, exist_ok=True)
    logger = Logger.__new__(Logger)  # reuse only the PNG writer
    logger.path_plots = args.output

    @jax.jit
    def forward(z, rng):
        # p_mixed_noise = 0: single latent (get_gan_samples.py:37-41)
        return generator.apply(
            {"params": params, "noises": noises}, z,
            rngs={"noise": rng},
        )

    rng = jax.random.key(args.seed)
    done = 0
    idx = 0
    while done < args.samples:
        n = min(args.batch_size, args.samples - done)
        rng, kz, kn = jax.random.split(rng, 3)
        z = jax.random.normal(kz, (n, gcfg.latent_dimensions))
        imgs = jax.device_get(forward(z, kn))
        for i in range(n):
            logger.save_prediction(imgs[i : i + 1], f"sample_{idx}")
            idx += 1
        done += n
    print(f"Wrote {idx} samples to {args.output}")


if __name__ == "__main__":
    main()
