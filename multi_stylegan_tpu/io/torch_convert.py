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


# ---------------------------------------------------------------------------
# Optimizer-state (Adam moment) conversion.
#
# The reference checkpoint also stores both torch Adam state_dicts and
# restores them on --load_checkpoint (train_multi_stylegan.py:80-81).  All
# param conversions above are pure layout transforms (transpose / reshape /
# index), so exp_avg / exp_avg_sq transfer EXACTLY under the same transform
# (elementwise state commutes with permutation; the square in exp_avg_sq is
# elementwise too).  torch Adam state_dicts address parameters by integer
# index, assigned in the order the params were handed to the optimizer:
#   * generator: the 11 param groups of Generator.get_parameters
#     (multi_stylegan_generator.py:97-112), each group in that submodule's
#     torch named_parameters order;
#   * discriminator: plain .parameters() registration order
#     (u_net_2d_discriminator.py:33-101).
# Within one nn.Module, torch yields the module's DIRECT parameters first,
# then children in registration order (so e.g. OutputBlock.bias precedes its
# modulated_convolution weights: multi_stylegan_generator.py:472-510).  The
# order builders below are validated against real torch modules in
# tests/test_optim_convert.py, and every entry is shape-checked against the
# model state_dict at conversion time, so a misalignment is a hard error,
# never a silently wrong moment.
# ---------------------------------------------------------------------------

# Each entry: (torch_key, path_into_our_param_tree, numpy-layout-transform).
_id = lambda a: a
_t_linear = lambda a: a.transpose(1, 0)
_t_conv = lambda a: a.transpose(2, 3, 1, 0)  # OIHW -> HWIO
_t_modconv = lambda a: a[0].transpose(2, 3, 1, 0)  # [1,O,I,kh,kw] -> HWIO
_t_const = lambda a: a.transpose(0, 2, 3, 1)  # NCHW -> NHWC
_t_scalar1 = lambda a: a.reshape(1)
_t_scalar0 = lambda a: a.reshape(())


def _styled_conv_entries(prefix: str, path: tuple, mm: bool):
    e = [(f"{prefix}.modulated_convolution.weight",
          path + ("conv", "weight"), _t_modconv)]
    if mm:
        e += [(f"{prefix}.modulated_convolution.modulation_mapping.weight",
               path + ("conv", "modulation", "weight"), _t_linear),
              (f"{prefix}.modulated_convolution.modulation_mapping.bias",
               path + ("conv", "modulation", "bias"), _id)]
    e += [(f"{prefix}.noise_injection.weight", path + ("noise", "weight"), _id),
          (f"{prefix}.activation.bias", path + ("act", "bias"), _id)]
    return e


def _output_block_entries(prefix: str, path: tuple, mm: bool):
    # Direct parameter `bias` precedes the child module's params in torch's
    # iteration order (multi_stylegan_generator.py:505-510).
    e = [(f"{prefix}.bias", path + ("bias",), _t_scalar1),
         (f"{prefix}.modulated_convolution.weight",
          path + ("conv", "weight"), _t_modconv)]
    if mm:
        e += [(f"{prefix}.modulated_convolution.modulation_mapping.weight",
               path + ("conv", "modulation", "weight"), _t_linear),
              (f"{prefix}.modulated_convolution.modulation_mapping.bias",
               path + ("conv", "modulation", "bias"), _id)]
    return e


def generator_adam_groups(config: GeneratorConfig = GeneratorConfig()):
    """The 11 param groups of Generator.get_parameters
    (multi_stylegan_generator.py:97-112), as ordered entry lists: per-tower
    groups first (tower 1 then tower 2), style mapping LAST (the lr/100
    group).  Groups 0-9 train at lr_main, group 10 at lr_style."""
    groups = []
    for t, mm in ((1, True), (2, False)):
        groups.append([(f"constant_input_{t}.input",
                        (f"constant_input_{t}",), _t_const)])
        groups.append(_styled_conv_entries(
            f"starting_convolution_{t}", (f"starting_convolution_{t}",), mm))
        groups.append(_output_block_entries(
            f"starting_output_block_{t}", (f"starting_output_block_{t}",), mm))
        main = []
        for i in range(2 * config.n_stages):
            main += _styled_conv_entries(
                f"main_convolutions_{t}.{i}", (f"main_convolutions_{t}_{i}",), mm)
        groups.append(main)
        out = []
        for i in range(config.n_stages):
            out += _output_block_entries(
                f"output_blocks_{t}.{i}", (f"output_blocks_{t}_{i}",), mm)
        groups.append(out)
    style = []
    for i in range(config.depth_style_mapping):
        style += [
            (f"style_mapping.layers.{1 + 2 * i}.weight",
             ("style_mapping", f"linear_{i}", "weight"), _t_linear),
            (f"style_mapping.layers.{2 + 2 * i}.bias",
             ("style_mapping", f"act_{i}", "bias"), _id),
        ]
    groups.append(style)
    return groups


def generator_adam_order(config: GeneratorConfig = GeneratorConfig()):
    """Flattened generator_adam_groups: ordered (torch_key, our_path,
    transform) entries matching the global torch Adam param indices."""
    return [e for group in generator_adam_groups(config) for e in group]


def discriminator_adam_order(
    model_sd: Mapping[str, Any],
    config: DiscriminatorConfig = DiscriminatorConfig(),
):
    """Ordered (torch_key, our_path, transform) list matching
    ``Discriminator.parameters()`` registration order
    (u_net_2d_discriminator.py:33-101).  Residual-mapping presence is read
    off the (prefix-stripped) model state_dict, as in convert_discriminator."""

    def resnet(prefix, path):
        e = [(f"{prefix}.main_mapping.0.weight", path + ("conv_0", "weight"), _t_conv),
             (f"{prefix}.main_mapping.1.bias", path + ("act_0", "bias"), _id),
             (f"{prefix}.main_mapping.2.weight", path + ("conv_1", "weight"), _t_conv),
             (f"{prefix}.main_mapping.3.bias", path + ("act_1", "bias"), _id)]
        if f"{prefix}.residual_mapping.weight" in model_sd:
            e.append((f"{prefix}.residual_mapping.weight",
                      path + ("residual", "weight"), _t_conv))
        return e

    def nonlocal_(prefix, path):
        # gamma is a direct parameter of the block, so it precedes every
        # child conv (u_net_2d_discriminator.py:335-358 + torch's
        # direct-params-first iteration).
        e = [(f"{prefix}.gamma", path + ("gamma",), _t_scalar0)]
        e += [(f"{prefix}.{n}.weight", path + (n, "weight"), _t_conv)
              for n in ("theta", "phi", "g", "o")]
        if f"{prefix}.residual_mapping.weight" in model_sd:
            e.append((f"{prefix}.residual_mapping.weight",
                      path + ("residual", "weight"), _t_conv))
        return e

    entries = []
    n_enc = len(config.encoder_channels)
    for i in range(n_enc):
        prefix, path = f"encoder_blocks.{i}", (f"encoder_{i}",)
        entries += nonlocal_(prefix, path) if i == 2 else resnet(prefix, path)
    for i in range(n_enc - 1):
        entries += [(f"downscale_convolutions.{i}.0.weight",
                     (f"downscale_{i}", "weight"), _t_conv),
                    (f"downscale_convolutions.{i}.0.bias",
                     (f"downscale_{i}", "bias"), _id)]
    entries += [("classification_head.2.weight", ("head_linear_0", "weight"), _t_linear),
                ("classification_head.3.bias", ("head_act", "bias"), _id),
                ("classification_head.4.weight", ("head_linear_1", "weight"), _t_linear)]
    for i in range(len(config.decoder_channels)):
        prefix, path = f"decoder_blocks.{i}", (f"decoder_{i}",)
        entries += nonlocal_(prefix, path) if i == 1 else resnet(prefix, path)
    for i in range(len(config.decoder_channels)):
        entries.append((f"transposed_convolutions.{i}.1.weight",
                        (f"upconv_{i}", "weight"), _t_conv))
    entries += [("final_mapping.0.bias", ("final_act", "bias"), _id),
                ("final_mapping.1.weight", ("final_conv", "weight"), _t_conv)]
    return entries


def _set_path(tree: Dict[str, Any], path: tuple, value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_adam_state(
    opt_state_dict: Mapping[str, Any],
    order,
    model_sd: Mapping[str, Any],
) -> Dict[str, Any]:
    """torch ``Adam.state_dict()`` -> ``{"mu", "nu", "count"}`` trees shaped
    like our param trees.

    ``order`` is a generator_adam_order / discriminator_adam_order list;
    ``model_sd`` the (prefix-stripped) matching model state_dict, used to
    shape-check every moment so an index misalignment raises instead of
    silently grafting the wrong moments.  Params the optimizer never stepped
    (absent from ``state``) get zero moments — torch Adam's own lazy init."""
    flat_idx = [i for g in opt_state_dict["param_groups"] for i in g["params"]]
    if len(flat_idx) != len(order):
        raise ValueError(
            f"optimizer has {len(flat_idx)} params but the architecture "
            f"order lists {len(order)} - config mismatch?")
    state = opt_state_dict["state"]
    mu: Dict[str, Any] = {}
    nu: Dict[str, Any] = {}
    steps = [0]
    for pos, (torch_key, path, transform) in enumerate(order):
        ref_shape = tuple(_np(model_sd[torch_key]).shape)
        st = state.get(flat_idx[pos])
        if st is None:
            m = np.zeros(ref_shape, np.float32)
            v = np.zeros(ref_shape, np.float32)
        else:
            m, v = _np(st["exp_avg"]), _np(st["exp_avg_sq"])
            if tuple(m.shape) != ref_shape:
                raise ValueError(
                    f"Adam moment at index {flat_idx[pos]} has shape "
                    f"{tuple(m.shape)} but '{torch_key}' expects {ref_shape}: "
                    "parameter ordering mismatch")
            s = st.get("step", 0)
            steps.append(int(s) if isinstance(s, (int, float))
                         else int(_np(s).reshape(())))
        _set_path(mu, path, transform(m.astype(np.float32)))
        _set_path(nu, path, transform(v.astype(np.float32)))
    return {"mu": mu, "nu": nu, "count": max(steps)}


# ---------------------------------------------------------------------------
# Reverse direction: framework pytrees -> reference-format ``.pt``.
#
# Every forward transform above is a pure permutation/reshape, so the export
# is its exact inverse; a framework-trained model (params, EMA, Adam moments)
# round-trips into a checkpoint the reference's own load path
# (train_multi_stylegan.py:73-86) accepts: unprefixed generator keys, the ADA
# wrapper's "discriminator." prefix (the reference saves the wrapped module,
# model_wrapper.py:181-192), deterministic blur/upsample kernel buffers
# recomputed from the reference's constructors, 6-key dict with an EMPTY
# path_length_regularization state_dict (``mean_path_length`` is a plain
# attribute, not a registered buffer, loss.py:353-369 — the reference itself
# loses it on resume; our native checkpoints keep it).
# ---------------------------------------------------------------------------

_INVERSE = {
    _id: _id,
    _t_linear: _t_linear,  # self-inverse
    _t_conv: lambda a: a.transpose(3, 2, 0, 1),  # HWIO -> OIHW
    _t_modconv: lambda a: a.transpose(3, 2, 0, 1)[None],  # HWIO -> [1,O,I,kh,kw]
    _t_const: lambda a: a.transpose(0, 3, 1, 2),  # NHWC -> NCHW
    _t_scalar1: lambda a: a.reshape(1, 1, 1, 1),
    _t_scalar0: lambda a: a.reshape(()),
}


def _get_path(tree, path: tuple):
    node = tree
    for key in path:
        node = node[key]
    return node


def _export_entries(sd: Dict[str, Any], entries, tree) -> None:
    for torch_key, path, transform in entries:
        sd[torch_key] = np.asarray(
            _INVERSE[transform](np.asarray(_get_path(tree, path), np.float32)))


def _blur_kernel_np(gain: float = 1.0,
                    taps=(1, 3, 3, 1)) -> "np.ndarray":
    """Reference ``make_kernel``: sum-normalized outer product
    (multi_stylegan_generator.py:551-566), times the upsampling Blur's
    ``sampling_factor ** 2`` gain when requested (:598-601)."""
    k = np.asarray(taps, np.float32)
    k = np.outer(k, k)
    return (k / k.sum() * gain).astype(np.float32)


def export_generator(
    params, noises, config: GeneratorConfig = GeneratorConfig()
) -> Dict[str, Any]:
    """Framework generator {params, noises} -> reference-keyed state_dict,
    including the deterministic buffer keys torch registered (upsampling
    modconv ``blur.kernel`` with gain 4, output-block ``upsampling.kernel``
    normalized, noise buffers)."""
    sd: Dict[str, Any] = {}
    _export_entries(sd, generator_adam_order(config), params)
    for t in (1, 2):
        for i in range(2 * config.n_stages):
            if i % 2 == 0:  # the (2,2) upsampling convs carry a Blur child
                sd[f"main_convolutions_{t}.{i}.modulated_convolution.blur."
                   "kernel"] = _blur_kernel_np(gain=4.0, taps=config.blur_taps)
        for i in range(config.n_stages):
            sd[f"output_blocks_{t}.{i}.upsampling.kernel"] = _blur_kernel_np(
                taps=config.blur_taps)
    for name, buf in noises.items():
        sd[f"noises.{name}"] = np.asarray(buf, np.float32).transpose(0, 3, 1, 2)
    return sd


def export_discriminator(
    params, config: DiscriminatorConfig = DiscriminatorConfig()
) -> Dict[str, Any]:
    """Framework discriminator params -> reference-keyed state_dict WITHOUT
    the ADA-wrapper prefix (callers add it for the checkpoint dict)."""
    # Build a presence-only fake sd so the order builder can see which
    # residual mappings exist (channel-inequality, same rule both ways).
    probe = {}
    for block, prefix in (
        [(params.get(f"encoder_{i}"), f"encoder_blocks.{i}")
         for i in range(len(config.encoder_channels))]
        + [(params.get(f"decoder_{i}"), f"decoder_blocks.{i}")
           for i in range(len(config.decoder_channels))]
    ):
        if block and "residual" in block:
            probe[f"{prefix}.residual_mapping.weight"] = True
    sd: Dict[str, Any] = {}
    _export_entries(sd, discriminator_adam_order(probe, config), params)
    for i in range(len(config.encoder_channels) - 1):
        sd[f"downscale_convolutions.{i}.1.kernel"] = _blur_kernel_np()
    for i in range(len(config.decoder_channels)):
        sd[f"transposed_convolutions.{i}.0.kernel"] = _blur_kernel_np()
    return sd


def export_adam_state(
    moments: Mapping[str, Any],
    grouped_entries,
    lrs,
    betas=(0.0, 0.999),
) -> Dict[str, Any]:
    """{"mu","nu","count"} trees -> a torch ``Adam.state_dict()``-format dict
    (torch-1.8 field set, the reference's environment) with the reference's
    param-group structure; ``lrs`` gives one learning rate per group."""
    assert len(lrs) == len(grouped_entries)
    state: Dict[int, Any] = {}
    param_groups = []
    idx = 0
    count = int(moments["count"])
    for group, lr in zip(grouped_entries, lrs):
        ids = []
        for torch_key, path, transform in group:
            inv = _INVERSE[transform]
            state[idx] = {
                "step": count,
                "exp_avg": inv(np.asarray(_get_path(moments["mu"], path),
                                          np.float32)),
                "exp_avg_sq": inv(np.asarray(_get_path(moments["nu"], path),
                                             np.float32)),
            }
            ids.append(idx)
            idx += 1
        param_groups.append({
            "lr": float(lr), "betas": (float(betas[0]), float(betas[1])),
            "eps": 1e-8, "weight_decay": 0, "amsgrad": False, "params": ids,
        })
    return {"state": state, "param_groups": param_groups}


def export_reference_checkpoint(
    g_params, g_noises, g_ema_params, d_params,
    g_config: GeneratorConfig = GeneratorConfig(),
    d_config: DiscriminatorConfig = DiscriminatorConfig(),
    g_adam: Mapping[str, Any] | None = None,
    d_adam: Mapping[str, Any] | None = None,
    lr_generator: float = 2e-4,
    lr_discriminator: float = 6e-4,
    lr_style_factor: float = 0.01,
    adam_betas=(0.0, 0.999),
) -> Dict[str, Any]:
    """Build the reference's 6-key checkpoint dict (model_wrapper.py:181-192)
    from framework pytrees, as torch tensors ready for ``torch.save``.

    ``g_adam``/``d_adam`` are {"mu","nu","count"} trees (see
    train.state.extract_adam_moments); when omitted, zero moments at count 0
    are emitted so the reference's unconditional optimizer restore
    (train_multi_stylegan.py:80-81) still succeeds."""
    import torch

    def zeros_like_tree(tree):
        return jax_free_map(lambda a: np.zeros(np.asarray(a).shape, np.float32),
                            tree)

    def jax_free_map(fn, tree):
        if isinstance(tree, Mapping):
            return {k: jax_free_map(fn, v) for k, v in tree.items()}
        return fn(tree)

    if g_adam is None:
        g_adam = {"mu": zeros_like_tree(g_params),
                  "nu": zeros_like_tree(g_params), "count": 0}
    if d_adam is None:
        d_adam = {"mu": zeros_like_tree(d_params),
                  "nu": zeros_like_tree(d_params), "count": 0}

    g_groups = generator_adam_groups(g_config)
    g_lrs = [lr_generator] * (len(g_groups) - 1) + [
        lr_generator * lr_style_factor]
    d_probe = export_discriminator(d_params, d_config)
    d_order = discriminator_adam_order(d_probe, d_config)

    def to_torch(d):
        return {k: torch.from_numpy(np.array(v, np.float32)) if not isinstance(
            v, (int, float, list, tuple, dict)) else v for k, v in d.items()}

    def opt_to_torch(opt_sd):
        return {
            "state": {i: {"step": s["step"],
                          "exp_avg": torch.from_numpy(
                              np.array(s["exp_avg"], np.float32)),
                          "exp_avg_sq": torch.from_numpy(
                              np.array(s["exp_avg_sq"], np.float32))}
                      for i, s in opt_sd["state"].items()},
            "param_groups": opt_sd["param_groups"],
        }

    return {
        "generator_ema": to_torch(
            export_generator(g_ema_params, g_noises, g_config)),
        "generator": to_torch(export_generator(g_params, g_noises, g_config)),
        "generator_optimizer": opt_to_torch(export_adam_state(
            g_adam, g_groups, g_lrs, adam_betas)),
        "discriminator": {f"discriminator.{k}": v
                          for k, v in to_torch(d_probe).items()},
        "discriminator_optimizer": opt_to_torch(export_adam_state(
            d_adam, [d_order], [lr_discriminator], adam_betas)),
        # mean_path_length is a plain attribute in the reference, so its
        # state_dict is empty (loss.py:353-369) - emit the same.
        "path_length_regularization": {},
    }


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``checkpoint_{epoch}.pt`` with torch (CPU)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_reference_checkpoint(
    path: str,
    g_config: GeneratorConfig = GeneratorConfig(),
    d_config: DiscriminatorConfig = DiscriminatorConfig(),
) -> Dict[str, Any]:
    """Convert the published 6-key checkpoint into framework pytrees.

    When the checkpoint carries the torch Adam state_dicts (the reference
    always saves and restores them, train_multi_stylegan.py:80-81 /
    model_wrapper.py:181-192), they are converted too — the param mapping is
    pure layout, so moments transfer exactly — under ``generator_adam`` /
    ``discriminator_adam`` ({"mu", "nu", "count"} trees for
    train.state.install_adam_moments)."""
    ckpt = load_torch_checkpoint(path)
    out = {
        "generator_ema": convert_generator(ckpt["generator_ema"], g_config),
        "generator": convert_generator(ckpt["generator"], g_config),
        "discriminator": convert_discriminator(ckpt["discriminator"], d_config),
    }
    plr = ckpt.get("path_length_regularization")
    if plr and "mean_path_length" in plr:
        out["mean_path_length"] = float(_np(plr["mean_path_length"]).reshape(()))
    if "generator_optimizer" in ckpt:
        out["generator_adam"] = convert_adam_state(
            ckpt["generator_optimizer"], generator_adam_order(g_config),
            strip_prefixes(ckpt["generator"]))
    if "discriminator_optimizer" in ckpt:
        d_sd = strip_prefixes(ckpt["discriminator"])
        out["discriminator_adam"] = convert_adam_state(
            ckpt["discriminator_optimizer"],
            discriminator_adam_order(d_sd, d_config), d_sd)
    return out
