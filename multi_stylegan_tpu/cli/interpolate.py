"""Latent-space interpolation CLI - parity with reference
scripts/gan_latent_space_interpolation.py:28-62.

16 anchor latents -> linear interpolation in z-space to 1600 points ->
batched EMA-generator forwards with ``randomize_noise=False`` -> BF|GFP
stacked frames -> animated GIF (and mp4 when ffmpeg is available; the
environment here has none)."""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", default="", type=str)
    parser.add_argument("--anchors", default=16, type=int)
    parser.add_argument("--frames", default=1600, type=int)
    parser.add_argument("--batch_size", default=32, type=int)
    parser.add_argument("--output", default="interpolation", type=str)
    parser.add_argument("--fps", default=60, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--tiny", default=False, action="store_true")
    parser.add_argument("--keep_frames", default=False, action="store_true")
    parser.add_argument("--platform", default=None, type=str,
                        help="Force a jax platform (e.g. 'cpu'); the axon TPU "
                             "plugin ignores JAX_PLATFORMS, this flag works.")
    return parser


def linear_interpolate_latents(anchors, n_frames: int):
    """Piecewise-linear resampling of [A, D] anchors to [n_frames, D]
    (the reference uses F.interpolate(mode='linear'), interp.py:36-40:
    align_corners=False linear resize over the anchor axis)."""
    import numpy as np

    a, d = anchors.shape
    # torch F.interpolate(mode="linear", align_corners=False) semantics:
    # out[i] samples input at (i + 0.5) * a / n - 0.5, edge-clamped.
    pos = (np.arange(n_frames) + 0.5) * a / n_frames - 0.5
    pos = np.clip(pos, 0, a - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, a - 1)
    t = (pos - lo)[:, None]
    return anchors[lo] * (1 - t) + anchors[hi] * t


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from multi_stylegan_tpu.cli.sample import load_ema_generator
    from multi_stylegan_tpu.models.config import GeneratorConfig, tiny_generator_config

    gcfg = tiny_generator_config() if args.tiny else GeneratorConfig()
    generator, params, noises = load_ema_generator(args.checkpoint, gcfg)

    rng = jax.random.key(args.seed)
    anchors = np.asarray(jax.random.normal(rng, (args.anchors, gcfg.latent_dimensions)))
    zs = linear_interpolate_latents(anchors, args.frames)

    @jax.jit
    def forward(z):
        return generator.apply(
            {"params": params, "noises": noises}, z, randomize_noise=False
        )

    os.makedirs(args.output, exist_ok=True)
    frames = []
    for lo in range(0, args.frames, args.batch_size):
        batch = jnp.asarray(zs[lo : lo + args.batch_size], jnp.float32)
        imgs = np.asarray(jax.device_get(forward(batch)))  # [b, 2, T, H, W]
        for i in range(imgs.shape[0]):
            # BF | GFP side by side, middle frame (interp.py:47-56)
            bf = imgs[i, 0, imgs.shape[2] // 2]
            gfp = imgs[i, 1, imgs.shape[2] // 2]
            pane = np.concatenate([bf, gfp], axis=1)
            rgb = np.stack([pane, pane, pane], axis=-1)
            rgb[..., 0] *= np.concatenate(
                [np.ones_like(bf), np.zeros_like(gfp)], axis=1)[..., None][..., 0]
            rgb[..., 2] *= np.concatenate(
                [np.ones_like(bf), np.zeros_like(gfp)], axis=1)[..., None][..., 0]
            frame = np.clip(rgb * 255, 0, 255).astype(np.uint8)
            frames.append(Image.fromarray(frame))
            if args.keep_frames:
                frames[-1].save(os.path.join(args.output, f"frame_{lo + i:05d}.png"))

    gif_path = os.path.join(args.output, "interpolation.gif")
    frames[0].save(
        gif_path, save_all=True, append_images=frames[1:],
        duration=max(1, 1000 // args.fps), loop=0,
    )
    print(f"Wrote {gif_path} ({len(frames)} frames)")

    if shutil.which("ffmpeg") and args.keep_frames:
        mp4 = os.path.join(args.output, "interpolation.mp4")
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(args.fps),
             "-i", os.path.join(args.output, "frame_%05d.png"),
             "-c:v", "libx264", "-pix_fmt", "yuv420p", mp4],
            check=False,
        )
        print(f"Wrote {mp4}")


if __name__ == "__main__":
    main()
