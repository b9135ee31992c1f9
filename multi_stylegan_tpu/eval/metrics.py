"""FID / FVD / IS with the exact reference evaluation protocol.

Reference: reference multi_stylegan/validation_metrics.py (SURVEY.md §6):
5,000 real + 5,000 fake samples, EMA generator with ``p_mixed_noise=0``, a
random single timestep per batch replicated to 3 RGB channels for FID/IS,
the full 3-frame clip for FVD, batch-wise [-1, 1] renormalization
(misc.py:216-235 including its clamp(min=1e-3) quirk), Inception-v3
pool-2048 / I3D-Mixed_5c features, Frechet distance via scipy sqrtm.

Pretrained weights: the reference pulls torchvision's inception_v3 and ships
``pretrained_i3d/rgb_imagenet.pt``.  This environment has no network access,
so extractors load from paths given explicitly or via the environment
variables ``MSG_TPU_INCEPTION_PT`` / ``MSG_TPU_I3D_PT`` (torch state_dict
.pt files); ``allow_random_weights=True`` runs the full pipeline with random
features (useful for tests / plumbing, meaningless as a quality score).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_stylegan_tpu.eval.frechet import frechet_distance
from multi_stylegan_tpu.eval.i3d import InceptionI3D, convert_pytorch_i3d
from multi_stylegan_tpu.eval.inception_v3 import (
    InceptionV3,
    convert_torchvision_inception,
)


class WeightsUnavailable(RuntimeError):
    pass


def normalize_m1_1_batch(x: jax.Array) -> jax.Array:
    """Per-sample min-max to [0,1] (clamped at 1e-3), then to [-1, 1]
    (misc.py:216-235)."""
    flat = x.reshape(x.shape[0], -1)
    mn = jnp.min(flat, axis=1).reshape((-1,) + (1,) * (x.ndim - 1))
    mx = jnp.max(flat, axis=1).reshape((-1,) + (1,) * (x.ndim - 1))
    zero_one = jnp.clip((x - mn) / (mx - mn), 1e-3, None)
    return 2.0 * zero_one - 1.0


def resize_bilinear_antialias(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """kornia.resize(..., 'bilinear', antialias=True) equivalent: jax.image
    linear resize with antialiasing (NHWC spatial dims 1, 2)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, *size, c), method="linear", antialias=True)


@functools.lru_cache(maxsize=4)
def _replicator(mesh: jax.sharding.Mesh):
    """Jitted identity that all-gathers a mesh-sharded array to replicated
    (one compiled program per mesh, cached across validation batches)."""
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    return jax.jit(lambda a: a, out_shardings=rep)


def _to_host(x: jax.Array) -> np.ndarray:
    """Fetch an array to host, handling multi-process global arrays.

    At ``process_count > 1`` the input pipeline produces batch-sharded
    global arrays whose shards are not all addressable from one process —
    ``device_get`` raises on those.  Replicating through a jitted identity
    first (the same Gloo-backed gather proven by tools/mp_train_worker.py)
    makes every shard locally addressable; all processes then hold identical
    host copies, keeping the downstream (host-side numpy) Fréchet/IS math
    process-consistent."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    return np.asarray(jax.device_get(_replicator(x.sharding.mesh)(x)))


def _as_local(x) -> jax.Array:
    """Coerce a validation batch to a process-local array.

    Feature extractors hold process-local params; a globally-sharded batch
    cannot mix with them in one dispatch (the same constraint worked around
    for ``Trainer.sample``, train/loop.py).  Gathering the global batch to
    identical host copies and recomputing features on every process keeps
    the per-process Fréchet inputs identical — validation is rare, so the
    replicated compute is irrelevant next to process consistency."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return jnp.asarray(_to_host(x))
    return jnp.asarray(x)


def _load_torch_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj.get("state_dict", obj) if isinstance(obj, dict) else obj


def _random_timestep_rgb(images: jax.Array, domain: int, rng: jax.Array) -> jax.Array:
    """One random timestep (shared per batch, validation_metrics.py:247-256),
    replicated to 3 channels: [B, C, T, H, W] -> [B, H, W, 3]."""
    t = jax.random.randint(rng, (), 0, images.shape[2])
    frame = jax.lax.dynamic_index_in_dim(images[:, domain], t, axis=1, keepdims=False)
    return jnp.repeat(frame[..., None], 3, axis=-1)


class _MetricBase:
    def __init__(
        self,
        batch_size: int = 24,
        data_samples: int = 5000,
        no_rfp: bool = True,
        no_gfp: bool = False,
        latent_dimensions: int = 512,
        seed: int = 0,
        domain_batched: bool = True,
    ) -> None:
        self.batch_size = batch_size
        self.data_samples = data_samples
        self.no_rfp = no_rfp
        self.no_gfp = no_gfp
        self.latent_dimensions = latent_dimensions
        self.seed = seed
        # One jitted program per batch covering ALL domains: timestep
        # select + domain stack + feature net fused, one dispatch and one
        # host fetch per batch instead of one per domain.  Per-sample math
        # (normalize_m1_1_batch is per-sample min-max, the nets use running
        # stats) makes the stacked features identical to the per-domain
        # calls (tests/test_eval_metrics.py); on the tunneled axon runtime
        # the saved dispatch/fetch round trips are the measured win
        # (PERF.md "Validation-pass batching").
        self.domain_batched = domain_batched

    @property
    def _domains(self):
        if self.no_gfp:
            return (0,)
        if self.no_rfp:
            return (0, 1)
        return (0, 1, 2)

    def _fake_batches(self, generator_apply: Callable, rng: jax.Array):
        n_batches = math.ceil(self.data_samples / self.batch_size)
        for i in range(n_batches):
            rng, kz, kg = jax.random.split(rng, 3)
            z = jax.random.normal(kz, (self.batch_size, self.latent_dimensions))
            yield generator_apply(z, None, kg)


class FID(_MetricBase):
    """Frechet inception distance per imaging domain
    (validation_metrics.py:157-358)."""

    def __init__(self, inception_path: Optional[str] = None,
                 allow_random_weights: bool = False, **kw) -> None:
        super().__init__(**kw)
        path = inception_path or os.environ.get("MSG_TPU_INCEPTION_PT")
        self.model = InceptionV3()
        if path:
            sd = _load_torch_state_dict(path)
            self.params = jax.tree.map(jnp.asarray, convert_torchvision_inception(sd))
        elif allow_random_weights:
            self.params = self.model.init(
                jax.random.key(0), jnp.zeros((1, 299, 299, 3))
            )["params"]
        else:
            raise WeightsUnavailable(
                "FID needs torchvision inception_v3 weights: pass "
                "inception_path= or set MSG_TPU_INCEPTION_PT"
            )
        self._features = jax.jit(self._feature_fn)
        self._features_multi = jax.jit(self._multi_feature_fn)
        self.activations_real = None

    def _feature_fn(self, frames: jax.Array) -> jax.Array:
        """[B, H, W, 3] raw frames -> 2048-d pooled features: normalize to
        [-1,1] FIRST, then resize to 299 inside the net
        (validation_metrics.py:258, 588-591)."""
        x = normalize_m1_1_batch(frames)
        x = resize_bilinear_antialias(x, (299, 299))
        return self.model.apply({"params": self.params}, x, features_only=True)

    def _multi_feature_fn(self, images: jax.Array, dkeys: jax.Array) -> jax.Array:
        """All domains in one program: per-domain timestep select, stack
        along batch, one feature-net forward -> [n_domains*B, 2048]."""
        frames = jnp.concatenate(
            [_random_timestep_rgb(images, d, dkeys[j])
             for j, d in enumerate(self._domains)], axis=0)
        return self._feature_fn(frames)

    def _collect(self, batches, rng: jax.Array):
        acts = {d: [] for d in self._domains}
        count = 0
        for images in batches:
            images = _as_local(images)
            rng, kd = jax.random.split(rng)
            # Independent timestep draw per domain, mirroring the reference's
            # separate torch.randint per channel (validation_metrics.py:246-256).
            dkeys = jax.random.split(kd, len(self._domains))
            if self.domain_batched:
                feats = np.asarray(jax.device_get(
                    self._features_multi(images, dkeys)))
                b = images.shape[0]
                for j, d in enumerate(self._domains):
                    acts[d].append(feats[j * b:(j + 1) * b])
            else:
                for d, kt in zip(self._domains, dkeys):
                    frames = _random_timestep_rgb(images, d, kt)
                    acts[d].append(
                        np.asarray(jax.device_get(self._features(frames))))
            count += images.shape[0]
            if count >= self.data_samples:
                break
        return {
            d: np.concatenate(a, axis=0)[: self.data_samples] for d, a in acts.items()
        }

    def __call__(self, generator_apply: Callable, dataset, **kwargs):
        rng = jax.random.key(self.seed)
        if self.activations_real is None:
            self.activations_real = self._collect(iter(dataset), rng)
        rng_f = jax.random.key(self.seed + 1)
        acts_fake = self._collect(self._fake_batches(generator_apply, rng_f), rng_f)
        scores = tuple(
            frechet_distance(self.activations_real[d], acts_fake[d])
            for d in self._domains
        )
        return scores[0] if len(scores) == 1 else scores


class IS(_MetricBase):
    """Inception score per imaging domain (validation_metrics.py:16-154)."""

    def __init__(self, inception_path: Optional[str] = None,
                 allow_random_weights: bool = False, **kw) -> None:
        super().__init__(**kw)
        path = inception_path or os.environ.get("MSG_TPU_INCEPTION_PT")
        self.model = InceptionV3()
        if path:
            sd = _load_torch_state_dict(path)
            self.params = jax.tree.map(jnp.asarray, convert_torchvision_inception(sd))
        elif allow_random_weights:
            self.params = self.model.init(
                jax.random.key(0), jnp.zeros((1, 299, 299, 3))
            )["params"]
        else:
            raise WeightsUnavailable(
                "IS needs torchvision inception_v3 weights: pass "
                "inception_path= or set MSG_TPU_INCEPTION_PT"
            )
        self._probs = jax.jit(self._prob_fn)
        self._probs_multi = jax.jit(self._multi_prob_fn)

    def _prob_fn(self, frames: jax.Array) -> jax.Array:
        """IS preprocessing order differs from FID: resize FIRST, then
        renormalize (validation_metrics.py:44-52)."""
        x = resize_bilinear_antialias(frames, (299, 299))
        x = normalize_m1_1_batch(x)
        logits = self.model.apply({"params": self.params}, x, features_only=False)
        return jax.nn.softmax(logits, axis=1)

    def _multi_prob_fn(self, images: jax.Array, dkeys: jax.Array) -> jax.Array:
        """All domains in one program: per-domain timestep select, stack
        along batch, one forward -> [n_domains*B, 1000] softmax probs."""
        frames = jnp.concatenate(
            [_random_timestep_rgb(images, d, dkeys[j])
             for j, d in enumerate(self._domains)], axis=0)
        return self._prob_fn(frames)

    def __call__(self, generator_apply: Callable, **kwargs):
        rng = jax.random.key(self.seed + 2)
        probs = {d: [] for d in self._domains}
        for images in self._fake_batches(generator_apply, rng):
            images = _as_local(images)
            rng, kd = jax.random.split(rng)
            # Independent timestep draw per domain (validation_metrics.py:246-256).
            dkeys = jax.random.split(kd, len(self._domains))
            if self.domain_batched:
                p = np.asarray(jax.device_get(
                    self._probs_multi(images, dkeys)))
                b = images.shape[0]
                for j, d in enumerate(self._domains):
                    probs[d].append(p[j * b:(j + 1) * b])
            else:
                for d, kt in zip(self._domains, dkeys):
                    frames = _random_timestep_rgb(images, d, kt)
                    probs[d].append(
                        np.asarray(jax.device_get(self._probs(frames))))
        scores = []
        for d in self._domains:
            p = np.concatenate(probs[d], axis=0)[: self.data_samples]
            p_y = p.mean(axis=0, keepdims=True)
            kl = np.sum(p * np.log(p / p_y), axis=-1)
            scores.append(float(np.exp(kl.mean())))
        return scores[0] if len(scores) == 1 else tuple(scores)


class FVD(_MetricBase):
    """Frechet video distance per imaging domain over the full 3-frame clip
    (validation_metrics.py:361-568)."""

    def __init__(self, i3d_path: Optional[str] = None,
                 allow_random_weights: bool = False, **kw) -> None:
        super().__init__(**kw)
        path = i3d_path or os.environ.get("MSG_TPU_I3D_PT")
        self.model = InceptionI3D()
        if path:
            sd = _load_torch_state_dict(path)
            self.params = jax.tree.map(jnp.asarray, convert_pytorch_i3d(sd))
        elif allow_random_weights:
            self.params = self.model.init(
                jax.random.key(0), jnp.zeros((1, 3, 224, 224, 3))
            )["params"]
        else:
            raise WeightsUnavailable(
                "FVD needs the pytorch-i3d rgb_imagenet weights: pass "
                "i3d_path= or set MSG_TPU_I3D_PT"
            )
        self._features = jax.jit(self._feature_fn)
        self._features_multi = jax.jit(self._multi_feature_fn)
        self.activations_real = None

    def _multi_feature_fn(self, images: jax.Array) -> jax.Array:
        """All domains in one program: stack the per-domain clips along
        batch, one I3D forward -> [n_domains*B, 1024]."""
        clips = jnp.concatenate([images[:, d] for d in self._domains], axis=0)
        return self._feature_fn(clips)

    def _feature_fn(self, clips: jax.Array) -> jax.Array:
        """[B, C=1dom, T, H, W] -> I3D features: replicate to RGB, [-1,1]
        renormalize, resize to 224 (validation_metrics.py:454-468, 940-944)."""
        x = jnp.repeat(clips[:, None], 3, axis=1)  # [B, 3, T, H, W]
        x = normalize_m1_1_batch(x)
        b, c, t, h, w = x.shape
        flat = x.reshape(b, c * t, h, w).transpose(0, 2, 3, 1)
        flat = resize_bilinear_antialias(flat, (224, 224))
        x = flat.transpose(0, 3, 1, 2).reshape(b, c, t, 224, 224)
        x = x.transpose(0, 2, 3, 4, 1)  # NDHWC
        return self.model.apply({"params": self.params}, x)

    def _collect(self, batches):
        acts = {d: [] for d in self._domains}
        count = 0
        for images in batches:
            images = _as_local(images)
            if self.domain_batched:
                feats = np.asarray(jax.device_get(self._features_multi(images)))
                b = images.shape[0]
                for j, d in enumerate(self._domains):
                    acts[d].append(feats[j * b:(j + 1) * b])
            else:
                for d in self._domains:
                    acts[d].append(
                        np.asarray(jax.device_get(self._features(images[:, d])))
                    )
            count += images.shape[0]
            if count >= self.data_samples:
                break
        return {
            d: np.concatenate(a, axis=0)[: self.data_samples] for d, a in acts.items()
        }

    def __call__(self, generator_apply: Callable, dataset, **kwargs):
        if self.activations_real is None:
            self.activations_real = self._collect(iter(dataset))
        rng = jax.random.key(self.seed + 3)
        acts_fake = self._collect(self._fake_batches(generator_apply, rng))
        scores = tuple(
            frechet_distance(self.activations_real[d], acts_fake[d])
            for d in self._domains
        )
        return scores[0] if len(scores) == 1 else scores
