"""Converter: published PyTorch checkpoints -> this framework's pytrees.

The reference publishes a 6-key ``torch.save`` dict (reference README.md:
104-111, written at model_wrapper.py:181-192).  This module maps the torch
``state_dict`` names/layouts onto the flax param trees:

* torch NCHW conv weights ``[Cout, Cin, kh, kw]`` -> HWIO ``[kh, kw, Cin, Cout]``
* torch linear weights ``[out, in]`` -> ``[in, out]``
* modulated conv weights ``[1, Cout, Cin, kh, kw]`` -> HWIO (both plain and
  the transposed/upsampling variant: the reference stores one layout for
  both and reshapes at call time, multi_stylegan_generator.py:337-339)
* constant inputs ``[1, C, H, W]`` -> ``[1, H, W, C]``
* noise buffers ``[1, 1, H, W]`` -> ``[1, H, W, 1]``
* ``nn.DataParallel``'s ``module.`` and the ADA wrapper's ``discriminator.``
  prefixes are stripped (SURVEY.md §5 checkpoint notes)

Blur-kernel buffers are recomputed, not loaded.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from multi_stylegan_tpu.models.config import DiscriminatorConfig, GeneratorConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def strip_prefixes(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("discriminator."):
            k = k[len("discriminator."):]
        out[k] = v
    return out


def _conv_w(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _linear_w(t) -> np.ndarray:
    return _np(t).transpose(1, 0)


def _modconv(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """ModulatedConv2d params: weight [1,Cout,Cin,kh,kw] (+ optional style
    affine)."""
    out: Dict[str, Any] = {
        "weight": _np(sd[f"{prefix}.weight"])[0].transpose(2, 3, 1, 0)
    }
    mm_w = f"{prefix}.modulation_mapping.weight"
    if mm_w in sd:
        out["modulation"] = {
            "weight": _linear_w(sd[mm_w]),
            "bias": _np(sd[f"{prefix}.modulation_mapping.bias"]),
        }
    return out


def _styled_conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "conv": _modconv(sd, f"{prefix}.modulated_convolution"),
        "noise": {"weight": _np(sd[f"{prefix}.noise_injection.weight"])},
        "act": {"bias": _np(sd[f"{prefix}.activation.bias"])},
    }


def _output_block(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "conv": _modconv(sd, f"{prefix}.modulated_convolution"),
        "bias": _np(sd[f"{prefix}.bias"]).reshape(1),
    }


def convert_generator(
    state_dict: Mapping[str, Any], config: GeneratorConfig = GeneratorConfig()
) -> Dict[str, Any]:
    """torch Generator state_dict -> {'params': ..., 'noises': ...}."""
    sd = strip_prefixes(state_dict)
    params: Dict[str, Any] = {}

    # style mapping: Sequential [PixelNorm, (Linear, FusedLeakyReLU) * depth]
    sm: Dict[str, Any] = {}
    for i in range(config.depth_style_mapping):
        sm[f"linear_{i}"] = {
            "weight": _linear_w(sd[f"style_mapping.layers.{1 + 2 * i}.weight"])
        }
        sm[f"act_{i}"] = {"bias": _np(sd[f"style_mapping.layers.{2 + 2 * i}.bias"])}
    params["style_mapping"] = sm

    for t in (1, 2):
        params[f"constant_input_{t}"] = _np(
            sd[f"constant_input_{t}.input"]
        ).transpose(0, 2, 3, 1)
        params[f"starting_convolution_{t}"] = _styled_conv(
            sd, f"starting_convolution_{t}"
        )
        params[f"starting_output_block_{t}"] = _output_block(
            sd, f"starting_output_block_{t}"
        )
        for i in range(2 * config.n_stages):
            params[f"main_convolutions_{t}_{i}"] = _styled_conv(
                sd, f"main_convolutions_{t}.{i}"
            )
        for i in range(config.n_stages):
            params[f"output_blocks_{t}_{i}"] = _output_block(
                sd, f"output_blocks_{t}.{i}"
            )

    noises: Dict[str, Any] = {
        "noise_start": _np(sd["noises.noise_start"]).transpose(0, 2, 3, 1)
    }
    for i in range(2 * config.n_stages):
        noises[f"noise_{i}"] = _np(sd[f"noises.noise_{i}"]).transpose(0, 2, 3, 1)
    return {"params": params, "noises": noises}


def convert_discriminator(
    state_dict: Mapping[str, Any], config: DiscriminatorConfig = DiscriminatorConfig()
) -> Dict[str, Any]:
    """torch Discriminator state_dict -> {'params': ...}."""
    sd = strip_prefixes(state_dict)
    params: Dict[str, Any] = {}

    def resnet(prefix: str) -> Dict[str, Any]:
        block = {
            "conv_0": {"weight": _conv_w(sd[f"{prefix}.main_mapping.0.weight"])},
            "act_0": {"bias": _np(sd[f"{prefix}.main_mapping.1.bias"])},
            "conv_1": {"weight": _conv_w(sd[f"{prefix}.main_mapping.2.weight"])},
            "act_1": {"bias": _np(sd[f"{prefix}.main_mapping.3.bias"])},
        }
        rw = f"{prefix}.residual_mapping.weight"
        if rw in sd:
            block["residual"] = {"weight": _conv_w(sd[rw])}
        return block

    def nonlocal_block(prefix: str) -> Dict[str, Any]:
        block = {
            name: {"weight": _conv_w(sd[f"{prefix}.{name}.weight"])}
            for name in ("theta", "phi", "g", "o")
        }
        rw = f"{prefix}.residual_mapping.weight"
        if rw in sd:
            block["residual"] = {"weight": _conv_w(sd[rw])}
        block["gamma"] = _np(sd[f"{prefix}.gamma"]).reshape(())
        return block

    n_enc = len(config.encoder_channels)
    for i in range(n_enc):
        prefix = f"encoder_blocks.{i}"
        params[f"encoder_{i}"] = (
            nonlocal_block(prefix) if i == 2 else resnet(prefix)
        )
        if i != n_enc - 1:
            params[f"downscale_{i}"] = {
                "weight": _conv_w(sd[f"downscale_convolutions.{i}.0.weight"]),
                "bias": _np(sd[f"downscale_convolutions.{i}.0.bias"]),
            }

    params["head_linear_0"] = {"weight": _linear_w(sd["classification_head.2.weight"])}
    params["head_act"] = {"bias": _np(sd["classification_head.3.bias"])}
    params["head_linear_1"] = {"weight": _linear_w(sd["classification_head.4.weight"])}

    for i in range(len(config.decoder_channels)):
        prefix = f"decoder_blocks.{i}"
        params[f"decoder_{i}"] = nonlocal_block(prefix) if i == 1 else resnet(prefix)
        params[f"upconv_{i}"] = {
            "weight": _conv_w(sd[f"transposed_convolutions.{i}.1.weight"])
        }

    params["final_act"] = {"bias": _np(sd["final_mapping.0.bias"])}
    params["final_conv"] = {"weight": _conv_w(sd["final_mapping.1.weight"])}
    return {"params": params}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``checkpoint_{epoch}.pt`` with torch (CPU)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_reference_checkpoint(
    path: str,
    g_config: GeneratorConfig = GeneratorConfig(),
    d_config: DiscriminatorConfig = DiscriminatorConfig(),
) -> Dict[str, Any]:
    """Convert the published 6-key checkpoint into framework pytrees
    (optimizer state is NOT converted - torch Adam moments do not transfer
    meaningfully across the reparameterization)."""
    ckpt = load_torch_checkpoint(path)
    out = {
        "generator_ema": convert_generator(ckpt["generator_ema"], g_config),
        "generator": convert_generator(ckpt["generator"], g_config),
        "discriminator": convert_discriminator(ckpt["discriminator"], d_config),
    }
    plr = ckpt.get("path_length_regularization")
    if plr and "mean_path_length" in plr:
        out["mean_path_length"] = float(_np(plr["mean_path_length"]).reshape(()))
    return out
