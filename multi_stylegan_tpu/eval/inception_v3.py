"""Inception-v3 (eval-mode) in flax, torchvision-weight compatible.

Used by FID (pool-2048 features from Mixed_7c, reference
multi_stylegan/validation_metrics.py:571-615) and IS (class logits,
validation_metrics.py:16-154).  The architecture mirrors torchvision's
``inception_v3`` exactly (including ``transform_input=True``, which the
pretrained constructor enables), in NHWC with fused eval-mode batch norm
(eps=1e-3).  ``convert_torchvision_inception`` maps a torchvision
state_dict onto this module's params; see eval/weights.py for loading.

This port is inference-only: no aux head, no dropout randomness.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=0.001, eval) + relu."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (kh, kw, cin, self.features), jnp.float32)
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), self.strides,
            ((self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = (scale * lax.rsqrt(var + 1e-3)).astype(y.dtype)
        y = (y - mean.astype(y.dtype)) * inv + bias.astype(y.dtype)
        return nn.relu(y)


def _avg_pool3(x):
    # torch AvgPool2d(3, stride=1, padding=1) default count_include_pad=True
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


def _max_pool3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3_s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3_s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """NHWC Inception-v3; input [B, 299, 299, 3] in [-1, 1] (after the
    caller's renormalization); ``transform_input`` matches the pretrained
    torchvision constructor."""

    num_classes: int = 1000
    transform_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, features_only: bool = False):
        if self.transform_input:
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool3_s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        pooled = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [B, 2048]
        if features_only:
            return pooled
        wf = self.param("fc_weight", nn.initializers.lecun_normal(),
                        (2048, self.num_classes), jnp.float32)
        bf = self.param("fc_bias", nn.initializers.zeros, (self.num_classes,),
                        jnp.float32)
        return pooled @ wf.astype(pooled.dtype) + bf.astype(pooled.dtype)


# ---------------------------------------------------------------------------
# torchvision weight conversion
# ---------------------------------------------------------------------------


def _basic(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    def g(name):
        t = sd[f"{prefix}.{name}"]
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    return {
        "weight": g("conv.weight").transpose(2, 3, 1, 0),
        "bn_scale": g("bn.weight"),
        "bn_bias": g("bn.bias"),
        "bn_mean": g("bn.running_mean"),
        "bn_var": g("bn.running_var"),
    }


_BLOCK_BRANCHES = {
    "InceptionA": ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                   "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"),
    "InceptionB": ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"),
    "InceptionC": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                   "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                   "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
    "InceptionD": ("branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
                   "branch7x7x3_3", "branch7x7x3_4"),
    "InceptionE": ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                   "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                   "branch3x3dbl_3b", "branch_pool"),
}

_LAYOUT = (
    ("Conv2d_1a_3x3", None), ("Conv2d_2a_3x3", None), ("Conv2d_2b_3x3", None),
    ("Conv2d_3b_1x1", None), ("Conv2d_4a_3x3", None),
    ("Mixed_5b", "InceptionA"), ("Mixed_5c", "InceptionA"), ("Mixed_5d", "InceptionA"),
    ("Mixed_6a", "InceptionB"),
    ("Mixed_6b", "InceptionC"), ("Mixed_6c", "InceptionC"),
    ("Mixed_6d", "InceptionC"), ("Mixed_6e", "InceptionC"),
    ("Mixed_7a", "InceptionD"), ("Mixed_7b", "InceptionE"), ("Mixed_7c", "InceptionE"),
)


def convert_torchvision_inception(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision inception_v3 state_dict -> this module's params tree."""
    params: Dict[str, Any] = {}
    for name, kind in _LAYOUT:
        if kind is None:
            params[name] = _basic(state_dict, name)
        else:
            params[name] = {
                br: _basic(state_dict, f"{name}.{br}")
                for br in _BLOCK_BRANCHES[kind]
            }
    fw = state_dict["fc.weight"]
    fb = state_dict["fc.bias"]
    params["fc_weight"] = (
        fw.detach().cpu().numpy() if hasattr(fw, "detach") else np.asarray(fw)
    ).transpose(1, 0)
    params["fc_bias"] = fb.detach().cpu().numpy() if hasattr(fb, "detach") else np.asarray(fb)
    return params
