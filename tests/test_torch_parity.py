"""End-to-end numerical parity: converted params drive the JAX generator to
the same outputs as an INDEPENDENT torch implementation of the documented
reference math (SURVEY.md §2.3 formulas, written against torch ops from
scratch - not the reference code).  This jointly validates the checkpoint
converter layouts and the model semantics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multi_stylegan_tpu.io import convert_generator
from multi_stylegan_tpu.models import Generator
from multi_stylegan_tpu.models.config import tiny_generator_config
from tests.test_io import _fake_generator_state_dict


def _blur_kernel(gain=1.0):
    k = torch.tensor([1.0, 3.0, 3.0, 1.0])
    k = k[None, :] * k[:, None]
    return k / k.sum() * gain


def _upfirdn(x, kernel, up=1, pad=(0, 0)):
    """torch oracle upfirdn: zero-stuff, pad, depthwise conv with the
    flipped kernel."""
    b, c, h, w = x.shape
    if up > 1:
        z = torch.zeros(b, c, h, up, w, up)
        z[:, :, :, 0, :, 0] = x
        x = z.reshape(b, c, h * up, w * up)
    x = F.pad(x, (pad[0], pad[1], pad[0], pad[1]))
    kf = torch.flip(kernel, (0, 1))[None, None].repeat(c, 1, 1, 1)
    return F.conv2d(x, kf, groups=c)


def _eq_linear(x, w, b=None, bias_gain=1.0):
    out, inp = w.shape
    y = x @ (w * math.sqrt(2.0 / inp)).t()
    if b is not None:
        y = y + b * math.sqrt(2.0 / out) * bias_gain
    return y


def _fused_lrelu(x, bias, scale=1.0):
    if x.ndim == 4:
        x = x + bias[None, :, None, None]
    else:
        x = x + bias[None, :]
    return F.leaky_relu(x, 0.2) * scale


def _style_mapping(z, sd, depth):
    x = z / torch.sqrt((z ** 2).mean(dim=1, keepdim=True) + 1e-8)
    for i in range(depth):
        x = _eq_linear(x, sd[f"style_mapping.layers.{1 + 2 * i}.weight"])
        x = _fused_lrelu(x, sd[f"style_mapping.layers.{2 + 2 * i}.bias"])
    return x


def _modconv(x, w_latent, sd, prefix, k, demod, upsample):
    """Per-sample modulated conv exactly as documented
    (multi_stylegan_generator.py:365-414)."""
    b, cin = x.shape[0], x.shape[1]
    weight = sd[f"{prefix}.weight"][0]  # [Cout, Cin, k, k]
    cout = weight.shape[0]
    mm_w = f"{prefix}.modulation_mapping.weight"
    if mm_w in sd:
        s = _eq_linear(w_latent, sd[mm_w], sd[f"{prefix}.modulation_mapping.bias"])
        s = s.view(b, 1, cin, 1, 1)
    else:
        s = w_latent  # already-modulated style from tower 1
    scale = math.sqrt(2.0) / math.sqrt(cin * k * k)
    wmod = scale * weight[None] * s  # [B, Cout, Cin, k, k]
    if demod:
        d = torch.rsqrt((wmod ** 2).sum(dim=(2, 3, 4)) + 1e-8)
        wmod = wmod * d.view(b, cout, 1, 1, 1)
    outs = []
    for i in range(b):
        if upsample:
            y = F.conv_transpose2d(x[i : i + 1], wmod[i].transpose(0, 1), stride=2)
        else:
            y = F.conv2d(x[i : i + 1], wmod[i], padding=k // 2)
        outs.append(y)
    y = torch.cat(outs, 0)
    if upsample:
        y = _upfirdn(y, _blur_kernel(gain=4.0), pad=(2, 1))
    return y, (s if mm_w in sd else None)


def _styled_conv(x, w_latent, noise, sd, prefix, k, upsample):
    y, s = _modconv(x, w_latent, sd, f"{prefix}.modulated_convolution", k,
                    demod=True, upsample=upsample)
    y = y + sd[f"{prefix}.noise_injection.weight"] * noise
    y = _fused_lrelu(y, sd[f"{prefix}.activation.bias"])
    return y, s


def _output_block(x, w_latent, sd, prefix, skip=None):
    y, s = _modconv(x, w_latent, sd, f"{prefix}.modulated_convolution", 1,
                    demod=False, upsample=False)
    y = y + sd[f"{prefix}.bias"]
    if skip is not None:
        skip = _upfirdn(skip, _blur_kernel(), up=2, pad=(2, 1))
        y = y + skip
    return y, s


def _torch_generator(z, sd, cfg):
    b = z.shape[0]
    w = _style_mapping(z, sd, cfg.depth_style_mapping)
    noises = [sd["noises.noise_start"]] + [
        sd[f"noises.noise_{i}"] for i in range(2 * cfg.n_stages)
    ]
    out1 = sd["constant_input_1.input"].repeat(b, 1, 1, 1)
    out2 = sd["constant_input_2.input"].repeat(b, 1, 1, 1)
    out1, s = _styled_conv(out1, w, noises[0], sd, "starting_convolution_1", 3, False)
    out2, _ = _styled_conv(out2, s, noises[0], sd, "starting_convolution_2", 3, False)
    skip1, s = _output_block(out1, w, sd, "starting_output_block_1")
    skip2, _ = _output_block(out2, s, sd, "starting_output_block_2")
    for i in range(cfg.n_stages):
        out1, s = _styled_conv(out1, w, noises[2 * i + 1], sd,
                               f"main_convolutions_1.{2 * i}", 2, True)
        out2, _ = _styled_conv(out2, s, noises[2 * i + 1], sd,
                               f"main_convolutions_2.{2 * i}", 2, True)
        out1, s = _styled_conv(out1, w, noises[2 * i + 2], sd,
                               f"main_convolutions_1.{2 * i + 1}", 3, False)
        out2, _ = _styled_conv(out2, s, noises[2 * i + 2], sd,
                               f"main_convolutions_2.{2 * i + 1}", 3, False)
        skip1, s = _output_block(out1, w, sd, f"output_blocks_1.{i}", skip1)
        skip2, _ = _output_block(out2, s, sd, f"output_blocks_2.{i}", skip2)
    return torch.stack([skip1, skip2], dim=1)


def test_generator_matches_independent_torch_implementation():
    cfg = tiny_generator_config()
    sd = _fake_generator_state_dict(cfg)
    torch.manual_seed(7)
    z = torch.randn(2, cfg.latent_dimensions)

    with torch.no_grad():
        ref = _torch_generator(z, sd, cfg).numpy()

    converted = convert_generator(sd, cfg)
    model = Generator(cfg)
    img = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted["params"]),
         "noises": jax.tree.map(jnp.asarray, converted["noises"])},
        jnp.asarray(z.numpy()),
        randomize_noise=False,
    )
    assert img.shape == ref.shape
    np.testing.assert_allclose(np.asarray(img), ref, rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# Full U-Net discriminator oracle (VERDICT round-2 item 5): an INDEPENDENT
# torch implementation of SURVEY.md §2.4 (ResNet blocks, minibatch-stddev,
# SAGAN NonLocal with max-pooled phi/g, both heads, /sqrt(2) residuals,
# reference u_net_2d_discriminator.py:14-140), routed through
# convert_discriminator at the tiny config.  Proves the .pt checkpoint path
# numerically on the discriminator as test_generator_matches_* does for G.
# ---------------------------------------------------------------------------


def _eq_conv(x, w, stride=1, pad=0, bias=None):
    cin, kh, kw = w.shape[1], w.shape[2], w.shape[3]
    y = F.conv2d(x, w * math.sqrt(2.0 / (cin * kh * kw)), stride=stride,
                 padding=pad)
    if bias is not None:
        y = y + (bias * math.sqrt(2.0 / w.shape[0]))[None, :, None, None]
    return y


def _minibatch_std(x):
    m = x - x.mean(dim=0, keepdim=True)
    std = torch.sqrt((m ** 2).mean(dim=0).clamp(min=1e-8))
    stat = std.mean().view(1, 1, 1, 1).repeat(x.shape[0], 1, x.shape[2],
                                              x.shape[3])
    return torch.cat([x, stat], dim=1)


def _resnet_block(x, sd, prefix, mbstd=False):
    y = _minibatch_std(x) if mbstd else x
    y = _eq_conv(y, sd[f"{prefix}.main_mapping.0.weight"], pad=1)
    y = _fused_lrelu(y, sd[f"{prefix}.main_mapping.1.bias"])
    y = _eq_conv(y, sd[f"{prefix}.main_mapping.2.weight"], pad=1)
    y = _fused_lrelu(y, sd[f"{prefix}.main_mapping.3.bias"])
    res = x
    if f"{prefix}.residual_mapping.weight" in sd:
        res = _eq_conv(x, sd[f"{prefix}.residual_mapping.weight"])
    return (y + res) / math.sqrt(2.0)


def _nonlocal_block(x, sd, prefix, cout):
    theta = _eq_conv(x, sd[f"{prefix}.theta.weight"])
    phi = F.max_pool2d(_eq_conv(x, sd[f"{prefix}.phi.weight"]), 2)
    g = F.max_pool2d(_eq_conv(x, sd[f"{prefix}.g.weight"]), 2)
    b, c8, h, w = theta.shape
    logits = torch.einsum(
        "bcn,bcm->bnm", theta.reshape(b, c8, h * w), phi.reshape(b, c8, -1))
    beta = torch.softmax(logits, dim=-1)
    attended = torch.einsum(
        "bnm,bcm->bcn", beta, g.reshape(b, cout // 2, -1)
    ).reshape(b, cout // 2, h, w)
    o = _eq_conv(attended, sd[f"{prefix}.o.weight"])
    res = x
    if f"{prefix}.residual_mapping.weight" in sd:
        res = _eq_conv(x, sd[f"{prefix}.residual_mapping.weight"])
    return (sd[f"{prefix}.gamma"] * o + res) / math.sqrt(2.0)


def _torch_discriminator(x, sd, cfg):
    """[B, C, T, H, W] -> (scalar [B, 1], pixel [B, 1, 1, H, W])."""
    b, c, t, h, w = x.shape
    y = x.reshape(b, c * t, h, w)
    enc, dec = cfg.encoder_channels, cfg.decoder_channels
    n_enc = len(enc)
    features = []
    for i, (_, cout) in enumerate(enc):
        p = f"encoder_blocks.{i}"
        if i == 2:
            y = _nonlocal_block(y, sd, p, cout)
        else:
            y = _resnet_block(y, sd, p, mbstd=i >= n_enc - 2)
        if i != n_enc - 1:
            features.append(y)
            y = _eq_conv(y, sd[f"downscale_convolutions.{i}.0.weight"],
                         stride=2, bias=sd[f"downscale_convolutions.{i}.0.bias"])
            y = _upfirdn(y, _blur_kernel(), pad=(2, 2))
    pooled = y.mean(dim=(2, 3))
    cls = _eq_linear(pooled, sd["classification_head.2.weight"])
    cls = _fused_lrelu(cls, sd["classification_head.3.bias"])
    cls = _eq_linear(cls, sd["classification_head.4.weight"])
    for i, (din, dout) in enumerate(dec):
        skip = features[-(i + 1)]
        up = _upfirdn(y, _blur_kernel(), up=2, pad=(2, 1))
        up = _eq_conv(up, sd[f"transposed_convolutions.{i}.1.weight"])
        y = torch.cat([up, skip], dim=1)
        p = f"decoder_blocks.{i}"
        y = _nonlocal_block(y, sd, p, dout) if i == 1 else _resnet_block(y, sd, p)
    y = _fused_lrelu(y, sd["final_mapping.0.bias"])
    y = _eq_conv(y, sd["final_mapping.1.weight"])
    return cls, y[:, :, None]


def test_discriminator_matches_independent_torch_implementation():
    from multi_stylegan_tpu.io import convert_discriminator
    from multi_stylegan_tpu.models import Discriminator
    from multi_stylegan_tpu.models.config import tiny_discriminator_config
    from tests.test_io import _fake_discriminator_state_dict

    cfg = tiny_discriminator_config()
    sd_prefixed = _fake_discriminator_state_dict(cfg)
    # gamma init 0 would zero the attention path: set nonzero so the oracle
    # actually exercises theta/phi/g/o
    sd_prefixed["discriminator.encoder_blocks.2.gamma"] = torch.tensor(0.7)
    sd_prefixed["discriminator.decoder_blocks.1.gamma"] = torch.tensor(-0.4)
    sd = {k.removeprefix("discriminator."): v for k, v in sd_prefixed.items()}

    torch.manual_seed(11)
    x = torch.randn(4, 2, 3, 32, 32)
    with torch.no_grad():
        ref_cls, ref_pix = _torch_discriminator(x, sd, cfg)

    converted = convert_discriminator(sd_prefixed, cfg)
    model = Discriminator(cfg)
    cls, pix = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted["params"])},
        jnp.asarray(x.numpy()),
    )
    assert cls.shape == tuple(ref_cls.shape) and pix.shape == tuple(ref_pix.shape)
    np.testing.assert_allclose(np.asarray(cls), ref_cls.numpy(),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(pix), ref_pix.numpy(),
                               rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# Full-size converter round-trip (VERDICT round-3 item 7): a reference-keyed
# 6-key .pt at the FLAGSHIP config (512ch / 256px, reference README.md:
# 104-111) -> cli/convert -> orbax -> cli/sample, with numerical parity of
# the loaded EMA generator against the torch oracle above.  The tiny-config
# tests prove layouts; this proves them at the published checkpoint's real
# shapes.
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_full_size_checkpoint_round_trip(tmp_path):
    from multi_stylegan_tpu.cli import convert as convert_cli
    from multi_stylegan_tpu.cli import sample as sample_cli
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
    )
    from tests.test_io import _fake_discriminator_state_dict

    gcfg = GeneratorConfig()
    dcfg = DiscriminatorConfig(no_rfp=True)
    g_sd = _fake_generator_state_dict(gcfg)
    # EMA weights differ from the live generator's, so sampling the right
    # checkpoint key is provable; DataParallel's "module." prefix on one of
    # the two trees exercises strip_prefixes at full scale.
    g_ema_sd = {k: v * 1.02 if v.is_floating_point() else v
                for k, v in g_sd.items()}
    ckpt = {
        "generator": g_sd,
        "generator_ema": {f"module.{k}": v for k, v in g_ema_sd.items()},
        "generator_optimizer": {},
        "discriminator": _fake_discriminator_state_dict(dcfg),
        "discriminator_optimizer": {},
        "path_length_regularization": {
            "mean_path_length": torch.tensor(0.37)},
    }
    pt = tmp_path / "checkpoint_100.pt"
    torch.save(ckpt, pt)

    dest = tmp_path / "converted"
    convert_cli.main([str(pt), str(dest), "--step", "7"])

    # end-to-end: the sampling CLI consumes the converted checkpoint
    out_dir = tmp_path / "png"
    sample_cli.main(["--checkpoint", str(dest), "--samples", "1",
                     "--batch_size", "1", "--output", str(out_dir)])
    import os

    assert any(f.endswith(".png") for f in os.listdir(out_dir))

    # numerical parity of the loaded EMA generator vs the torch oracle
    generator, params, noises = sample_cli.load_ema_generator(str(dest), gcfg)
    torch.manual_seed(11)
    z = torch.randn(1, gcfg.latent_dimensions)
    with torch.no_grad():
        ref = _torch_generator(z, g_ema_sd, gcfg).numpy()
    img = jax.jit(
        lambda z: generator.apply({"params": params, "noises": noises}, z,
                                  randomize_noise=False)
    )(jnp.asarray(z.numpy()))
    assert img.shape == ref.shape == (1, 2, 3, 256, 256)
    np.testing.assert_allclose(np.asarray(img), ref, rtol=1e-2, atol=2e-3)
