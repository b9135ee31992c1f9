"""Synthetic TLFM-shaped fixtures: smoke training / tests without data.

Produces [C, T, H, W] sequences of drifting Gaussian "cells" (bright blobs on
the BF channel, sparse fluorescent blobs on GFP/RFP) in [0, 1] - the same
shape/normalization contract as :class:`TLFMDataset`.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class SyntheticTLFMDataset:
    def __init__(
        self,
        n_samples: int = 64,
        resolution: Tuple[int, int] = (256, 256),
        sequence_length: int = 3,
        channels: int = 2,
        seed: int = 0,
    ) -> None:
        self.n_samples = n_samples
        self.resolution = resolution
        self.sequence_length = sequence_length
        self.channels = channels
        self.seed = seed

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, item: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 100003 + int(item))
        h, w = self.resolution
        t = self.sequence_length
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        out = np.zeros((self.channels, t, h, w), np.float32)
        n_cells = rng.integers(2, 6)
        centers = rng.uniform(0.2, 0.8, size=(n_cells, 2)) * [h, w]
        radii = rng.uniform(0.03, 0.08, size=n_cells) * min(h, w)
        drift = rng.uniform(-0.01, 0.01, size=(n_cells, 2)) * min(h, w)
        for step in range(t):
            for c, r, d in zip(centers, radii, drift):
                cy, cx = c + d * step
                blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r)))
                out[0, step] += blob
                if self.channels > 1:
                    out[1, step] += 0.5 * blob * (r > 0.05 * min(h, w))
                if self.channels > 2:
                    out[2, step] += 0.3 * blob * (r < 0.05 * min(h, w))
        out += rng.normal(0, 0.02, size=out.shape).astype(np.float32)
        return np.clip(out, 0.0, 1.0)


class TeacherTLFMDataset:
    """"Real" sequences sampled from a FROZEN randomly-initialized Generator.

    The blob fixture (:class:`SyntheticTLFMDataset`) is trivially separable
    from generator samples, so the discriminator saturates (D loss -> 2e-5)
    and the ADA controller pins p at 0 (round-2 STABILITY.json).  A teacher
    generator makes the target distribution REALIZABLE by the student, so
    the adversarial game can balance - the fixture for healthy-dynamics
    hardware runs (VERDICT round-2 item 6).

    Samples are pre-generated once (on whatever backend JAX has) and
    normalized per sample/channel to [0, 1], matching the TLFM contract.
    """

    def __init__(
        self,
        n_samples: int = 256,
        resolution: Tuple[int, int] = (256, 256),
        seed: int = 17,
        generator=None,
        batch: int = 16,
        compute_dtype: str = "bfloat16",
    ) -> None:
        import jax
        import jax.numpy as jnp

        if generator is None:
            from multi_stylegan_tpu.models import Generator
            from multi_stylegan_tpu.models.config import GeneratorConfig

            n_stages = max(1, int(np.log2(resolution[0] // 4)))
            generator = Generator(GeneratorConfig(
                channels=(512,) * (n_stages + 1),
                compute_dtype=compute_dtype, remat=False,
            ))
        gcfg = generator.config
        assert gcfg.resolution == tuple(resolution), (gcfg.resolution, resolution)
        rngs = {"params": jax.random.key(seed), "noise": jax.random.key(seed + 1),
                "mixing": jax.random.key(seed + 2)}
        z0 = jnp.zeros((1, gcfg.latent_dimensions))
        variables = jax.jit(
            lambda: generator.init(rngs, z0, randomize_noise=False))()

        @jax.jit
        def sample(variables, z, key):
            return generator.apply(variables, z, randomize_noise=True,
                                   rngs={"noise": key})

        outs = []
        n_batches = -(-n_samples // batch)
        for i in range(n_batches):
            kz, kn = jax.random.split(jax.random.fold_in(
                jax.random.key(seed + 3), i))
            z = jax.random.normal(kz, (batch, gcfg.latent_dimensions))
            outs.append(np.asarray(jax.device_get(sample(variables, z, kn)),
                                   np.float32))
        imgs = np.concatenate(outs, axis=0)[:n_samples]  # [N, D, T, H, W]
        lo = imgs.min(axis=(2, 3, 4), keepdims=True)
        hi = imgs.max(axis=(2, 3, 4), keepdims=True)
        self._data = (imgs - lo) / np.maximum(hi - lo, 1e-6)

    def __len__(self) -> int:
        return self._data.shape[0]

    def __getitem__(self, item: int) -> np.ndarray:
        return self._data[item]
