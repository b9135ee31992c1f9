"""Inception-v1 I3D (eval-mode) in flax, pytorch-i3d weight compatible.

FVD's feature extractor (reference multi_stylegan/validation_metrics.py:
361-398, 631-951): the standard I3D ("Quo Vadis", arXiv:1705.07750) with the
reference's usage - endpoints truncated before Logits (VALID_ENDPOINTS[:-2],
validation_metrics.py:392), inputs bilinear-antialias-resized to 224
(:940-944), features = adaptive-avg-pool3d of Mixed_5c -> [B, 1024] (:946-951).

Layout NDHWC (batch, time, height, width, channel); 3D convs/pools use
TF-"SAME"-style dynamic padding exactly as the reference's compute_pad
(validation_metrics.py:633-663, 701-730) - for static shapes this equals
lax 'SAME' padding.  Eval-mode batch norm (eps=1e-3) fused into scale/shift.
``convert_pytorch_i3d`` maps the rgb_imagenet.pt state_dict onto the params.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class Unit3D(nn.Module):
    """conv3d (SAME, no bias) + eval BN(eps=1e-3) + relu
    (validation_metrics.py:666-738)."""

    features: int
    kernel_shape: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel_shape
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (kt, kh, kw, cin, self.features), jnp.float32)
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), self.strides, "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        if self.use_batch_norm:
            scale = self.param("bn_scale", nn.initializers.ones, (self.features,), jnp.float32)
            bias = self.param("bn_bias", nn.initializers.zeros, (self.features,), jnp.float32)
            mean = self.param("bn_mean", nn.initializers.zeros, (self.features,), jnp.float32)
            var = self.param("bn_var", nn.initializers.ones, (self.features,), jnp.float32)
            inv = (scale * lax.rsqrt(var + 1e-3)).astype(y.dtype)
            y = (y - mean.astype(y.dtype)) * inv + bias.astype(y.dtype)
        if self.activation:
            y = nn.relu(y)
        return y


def _max_pool_same(x, window: Tuple[int, int, int], strides: Tuple[int, int, int]):
    return nn.max_pool(x, window, strides=strides, padding="SAME")


class InceptionModule3D(nn.Module):
    """Four-branch 3D inception block (validation_metrics.py:741-766)."""

    out_channels: Sequence[int]  # (b0, b1a, b1b, b2a, b2b, b3b)

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        b0 = Unit3D(oc[0], (1, 1, 1), name="b0")(x)
        b1 = Unit3D(oc[1], (1, 1, 1), name="b1a")(x)
        b1 = Unit3D(oc[2], (3, 3, 3), name="b1b")(b1)
        b2 = Unit3D(oc[3], (1, 1, 1), name="b2a")(x)
        b2 = Unit3D(oc[4], (3, 3, 3), name="b2b")(b2)
        b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# (endpoint name, module kind, spec)
_I3D_LAYOUT = (
    ("Conv3d_1a_7x7", "unit", dict(features=64, kernel_shape=(7, 7, 7), strides=(2, 2, 2))),
    ("MaxPool3d_2a_3x3", "pool", dict(window=(1, 3, 3), strides=(1, 2, 2))),
    ("Conv3d_2b_1x1", "unit", dict(features=64, kernel_shape=(1, 1, 1))),
    ("Conv3d_2c_3x3", "unit", dict(features=192, kernel_shape=(3, 3, 3))),
    ("MaxPool3d_3a_3x3", "pool", dict(window=(1, 3, 3), strides=(1, 2, 2))),
    ("Mixed_3b", "mixed", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", "mixed", (128, 128, 192, 32, 96, 64)),
    ("MaxPool3d_4a_3x3", "pool", dict(window=(3, 3, 3), strides=(2, 2, 2))),
    ("Mixed_4b", "mixed", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", "mixed", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", "mixed", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", "mixed", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", "mixed", (256, 160, 320, 32, 128, 128)),
    ("MaxPool3d_5a_2x2", "pool", dict(window=(2, 2, 2), strides=(2, 2, 2))),
    ("Mixed_5b", "mixed", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", "mixed", (384, 192, 384, 48, 128, 128)),
)


class InceptionI3D(nn.Module):
    """Feature-extractor I3D: endpoints through Mixed_5c + global avg pool
    -> [B, 1024].  Optional 400-class logits head (num_classes > 0) for
    checkpoint completeness."""

    num_classes: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, features_only: bool = True) -> jax.Array:
        """x: [B, T, H, W, C] video in [-1, 1]."""
        for name, kind, spec in _I3D_LAYOUT:
            if kind == "unit":
                x = Unit3D(name=name, **spec)(x)
            elif kind == "pool":
                x = _max_pool_same(x, spec["window"], spec["strides"])
            else:
                x = InceptionModule3D(spec, name=name)(x)
        features = jnp.mean(x, axis=(1, 2, 3))  # adaptive avg pool3d
        if features_only or self.num_classes == 0:
            return features
        logits = Unit3D(self.num_classes, (1, 1, 1), use_batch_norm=False,
                        use_bias=True, activation=False, name="logits")(
            features[:, None, None, None, :]
        )
        return logits.reshape(logits.shape[0], -1)


# ---------------------------------------------------------------------------
# pytorch-i3d weight conversion (rgb_imagenet.pt)
# ---------------------------------------------------------------------------


def _unit(sd: Mapping[str, Any], prefix: str, with_bn: bool = True,
          with_bias: bool = False) -> Dict[str, np.ndarray]:
    def g(name):
        t = sd[f"{prefix}.{name}"]
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    out = {"weight": g("conv3d.weight").transpose(2, 3, 4, 1, 0)}  # OIDHW->DHWIO
    if with_bias:
        out["bias"] = g("conv3d.bias")
    if with_bn:
        out.update(
            bn_scale=g("bn.weight"), bn_bias=g("bn.bias"),
            bn_mean=g("bn.running_mean"), bn_var=g("bn.running_var"),
        )
    return out


def convert_pytorch_i3d(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """pytorch-i3d state_dict -> this module's params tree."""
    params: Dict[str, Any] = {}
    for name, kind, _ in _I3D_LAYOUT:
        if kind == "unit":
            params[name] = _unit(state_dict, name)
        elif kind == "mixed":
            params[name] = {
                br: _unit(state_dict, f"{name}.{br}")
                for br in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")
            }
    if "logits.conv3d.weight" in state_dict:
        params["logits"] = _unit(state_dict, "logits", with_bn=False, with_bias=True)
    return params
