"""Numerical parity of the eval feature extractors against INDEPENDENT torch
oracles (written from the published architectures, not the reference code).

Random weights are generated in torch modules whose attribute names reproduce
the torchvision `inception_v3` / pytorch-i3d `InceptionI3d` state_dict key
layouts; the state_dicts are routed through the repo's converters
(eval/inception_v3.py, eval/i3d.py) and the flax forwards must match the
torch forwards.  This proves both the ports and the converters, so FID/FVD
(reference multi_stylegan/validation_metrics.py:571-615, 631-951) become
trustworthy the moment real pretrained weights are supplied.

Runs in float64 on CPU: parity failures are architecture bugs, not noise.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from multi_stylegan_tpu.eval.i3d import InceptionI3D, convert_pytorch_i3d
from multi_stylegan_tpu.eval.inception_v3 import (
    InceptionV3,
    convert_torchvision_inception,
)


@pytest.fixture()
def f64():
    old = jax.config.read("jax_enable_x64")
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


def _randomize(module: nn.Module, seed: int) -> None:
    """Non-trivial weights AND batch-norm running stats, deterministic."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g, dtype=p.dtype) * 0.1)
        for name, buf in module.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g, dtype=buf.dtype) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g, dtype=buf.dtype) + 0.5)


# ---------------------------------------------------------------------------
# torch oracle: torchvision-style inception_v3 (eval mode, no aux head)
# ---------------------------------------------------------------------------


class TBasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class TInceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(bd))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([self.branch1x1(x), b7, bd, bp], 1)


class TInceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionE(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([self.branch1x1(x), b3, bd, bp], 1)


class TInceptionV3(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280)
        self.Mixed_7c = TInceptionE(2048)
        self.fc = nn.Linear(2048, 1000)

    def forward(self, x, transform_input=True):
        if transform_input:
            ch0 = x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = torch.cat([ch0, ch1, ch2], 1)
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(self, name)(x)
        pooled = x.mean(dim=(2, 3))
        return pooled, self.fc(pooled)


# ---------------------------------------------------------------------------
# torch oracle: pytorch-i3d-style InceptionI3d (eval mode, through Mixed_5c)
# ---------------------------------------------------------------------------


def _same_pad3d(x: torch.Tensor, k, s) -> torch.Tensor:
    """TF-'SAME' dynamic padding (validation_metrics.py:633-663 behavior)."""
    pads = []
    for dim in (4, 3, 2):  # F.pad order: last dim first
        size = x.shape[dim]
        i = dim - 2
        total = max(k[i] - s[i], 0) if size % s[i] == 0 \
            else max(k[i] - size % s[i], 0)
        pads.extend([total // 2, total - total // 2])
    return F.pad(x, pads)


class TUnit3D(nn.Module):
    def __init__(self, cin, cout, k=(1, 1, 1), s=(1, 1, 1), use_bn=True,
                 use_bias=False, act=True):
        super().__init__()
        self.k, self.s, self.act, self.use_bn = k, s, act, use_bn
        self.conv3d = nn.Conv3d(cin, cout, k, stride=s, bias=use_bias)
        if use_bn:
            self.bn = nn.BatchNorm3d(cout, eps=0.001, momentum=0.01)

    def forward(self, x):
        x = self.conv3d(_same_pad3d(x, self.k, self.s))
        if self.use_bn:
            x = self.bn(x)
        return F.relu(x) if self.act else x


class TMaxPool3dSame(nn.Module):
    def __init__(self, k, s):
        super().__init__()
        self.k, self.s = k, s

    def forward(self, x):
        return F.max_pool3d(_same_pad3d(x, self.k, self.s), self.k, self.s)


class TInceptionModule(nn.Module):
    def __init__(self, cin, oc):
        super().__init__()
        self.b0 = TUnit3D(cin, oc[0])
        self.b1a = TUnit3D(cin, oc[1])
        self.b1b = TUnit3D(oc[1], oc[2], k=(3, 3, 3))
        self.b2a = TUnit3D(cin, oc[3])
        self.b2b = TUnit3D(oc[3], oc[4], k=(3, 3, 3))
        self.b3a = TMaxPool3dSame((3, 3, 3), (1, 1, 1))
        self.b3b = TUnit3D(cin, oc[5])

    def forward(self, x):
        return torch.cat([
            self.b0(x), self.b1b(self.b1a(x)), self.b2b(self.b2a(x)),
            self.b3b(self.b3a(x)),
        ], 1)


class TInceptionI3d(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv3d_1a_7x7 = TUnit3D(3, 64, k=(7, 7, 7), s=(2, 2, 2))
        self.pool_2a = TMaxPool3dSame((1, 3, 3), (1, 2, 2))
        self.Conv3d_2b_1x1 = TUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TUnit3D(64, 192, k=(3, 3, 3))
        self.pool_3a = TMaxPool3dSame((1, 3, 3), (1, 2, 2))
        self.Mixed_3b = TInceptionModule(192, (64, 96, 128, 16, 32, 32))
        self.Mixed_3c = TInceptionModule(256, (128, 128, 192, 32, 96, 64))
        self.pool_4a = TMaxPool3dSame((3, 3, 3), (2, 2, 2))
        self.Mixed_4b = TInceptionModule(480, (192, 96, 208, 16, 48, 64))
        self.Mixed_4c = TInceptionModule(512, (160, 112, 224, 24, 64, 64))
        self.Mixed_4d = TInceptionModule(512, (128, 128, 256, 24, 64, 64))
        self.Mixed_4e = TInceptionModule(512, (112, 144, 288, 32, 64, 64))
        self.Mixed_4f = TInceptionModule(528, (256, 160, 320, 32, 128, 128))
        self.pool_5a = TMaxPool3dSame((2, 2, 2), (2, 2, 2))
        self.Mixed_5b = TInceptionModule(832, (256, 160, 320, 32, 128, 128))
        self.Mixed_5c = TInceptionModule(832, (384, 192, 384, 48, 128, 128))

    def forward(self, x):
        x = self.pool_2a(self.Conv3d_1a_7x7(x))
        x = self.pool_3a(self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(x)))
        x = self.Mixed_3c(self.Mixed_3b(x))
        x = self.pool_4a(x)
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = getattr(self, name)(x)
        x = self.pool_5a(x)
        x = self.Mixed_5c(self.Mixed_5b(x))
        return x.mean(dim=(2, 3, 4))  # adaptive avg pool3d -> [B, 1024]


# ---------------------------------------------------------------------------
# block-level parity (fast, tight)
# ---------------------------------------------------------------------------


def test_basic_conv2d_block_parity(f64):
    tm = TBasicConv2d(8, 16, kernel_size=3, stride=2).double().eval()
    _randomize(tm, 3)
    x = torch.randn(2, 8, 17, 17, generator=torch.Generator().manual_seed(4),
                    dtype=torch.float64)
    with torch.no_grad():
        ref = tm(x).numpy()

    from multi_stylegan_tpu.eval.inception_v3 import BasicConv2d, _basic

    sd = {f"blk.{k}": v for k, v in tm.state_dict().items()}
    params = _basic(sd, "blk")
    m = BasicConv2d(16, (3, 3), strides=(2, 2))
    out = m.apply({"params": jax.tree.map(jnp.asarray, params)},
                  jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-9, atol=1e-9)


def test_unit3d_block_parity(f64):
    tm = TUnit3D(4, 8, k=(3, 3, 3), s=(2, 2, 2)).double().eval()
    _randomize(tm, 5)
    x = torch.randn(2, 4, 7, 13, 13, generator=torch.Generator().manual_seed(6),
                    dtype=torch.float64)
    with torch.no_grad():
        ref = tm(x).numpy()

    from multi_stylegan_tpu.eval.i3d import Unit3D, _unit

    sd = {f"u.{k}": v for k, v in tm.state_dict().items()}
    params = _unit(sd, "u")
    m = Unit3D(8, (3, 3, 3), (2, 2, 2))
    out = m.apply({"params": jax.tree.map(jnp.asarray, params)},
                  jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, rtol=1e-9, atol=1e-9)


# ---------------------------------------------------------------------------
# full-network parity through the converters
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_inception_v3_full_parity_through_converter(f64):
    tm = TInceptionV3().double().eval()
    _randomize(tm, 11)
    x = torch.randn(2, 3, 299, 299,
                    generator=torch.Generator().manual_seed(12),
                    dtype=torch.float64)
    with torch.no_grad():
        ref_pool, ref_logits = tm(x)

    params = convert_torchvision_inception(tm.state_dict())
    model = InceptionV3()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = {"params": jax.tree.map(jnp.asarray, params)}
    pooled = model.apply(variables, xj, features_only=True)
    logits = model.apply(variables, xj)
    np.testing.assert_allclose(np.asarray(pooled), ref_pool.numpy(),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.slow
def test_i3d_full_parity_through_converter(f64):
    tm = TInceptionI3d().double().eval()
    _randomize(tm, 21)
    x = torch.randn(2, 3, 9, 64, 64,
                    generator=torch.Generator().manual_seed(22),
                    dtype=torch.float64)
    with torch.no_grad():
        ref = tm(x).numpy()

    params = convert_pytorch_i3d(tm.state_dict())
    model = InceptionI3D()
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-7, atol=1e-8)


def test_i3d_converter_consumes_exact_pytorch_i3d_key_layout():
    """The converter must address every key of a pytorch-i3d state_dict and
    nothing else (validation_metrics.py:951 load_state_dict(strict))."""
    tm = TInceptionI3d()
    sd = dict(tm.state_dict())
    params = convert_pytorch_i3d(sd)
    n_arrays = len(jax.tree.leaves(params))
    n_tensors = len([k for k in sd if "num_batches_tracked" not in k])
    assert n_arrays == n_tensors
