"""Torch Adam moment conversion (io/torch_convert.py::convert_adam_state).

The reference saves/restores both optimizer state_dicts in its checkpoints
(reference train_multi_stylegan.py:80-81, model_wrapper.py:181-192).  The
converter's index->name ordering claims are validated here against REAL
torch modules whose attribute-assignment order mirrors the reference source
(multi_stylegan_generator.py:34-112, u_net_2d_discriminator.py:33-101) —
torch itself derives ``parameters()`` order from the module structure, so
these replicas independently check the hardcoded order lists.  The replicas
are shape-only skeletons (no forward); values come from the fake reference
state dicts in tests/test_io.py.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from multi_stylegan_tpu.io.torch_convert import (
    convert_adam_state,
    convert_discriminator,
    convert_generator,
    convert_reference_checkpoint,
    discriminator_adam_order,
    generator_adam_order,
    strip_prefixes,
)
from multi_stylegan_tpu.models.config import (
    TrainingConfig,
    tiny_discriminator_config,
    tiny_generator_config,
)
from tests.test_io import (
    _fake_discriminator_state_dict,
    _fake_generator_state_dict,
)


def _param(sd, key):
    return nn.Parameter(sd[key].detach().clone().float())


class _EqLinear(nn.Module):
    """equalized_layer.py:210-233: weight, then optional bias."""

    def __init__(self, sd, prefix, bias):
        super().__init__()
        self.weight = _param(sd, f"{prefix}.weight")
        self.bias = _param(sd, f"{prefix}.bias") if bias else None


class _EqConv(nn.Module):
    """equalized_layer.py:9-44: weight, then optional bias."""

    def __init__(self, sd, prefix, bias):
        super().__init__()
        self.weight = _param(sd, f"{prefix}.weight")
        self.bias = _param(sd, f"{prefix}.bias") if bias else None


class _FusedLReLU(nn.Module):
    """op_static/fused_act.py:76-80: bias only."""

    def __init__(self, sd, prefix):
        super().__init__()
        self.bias = _param(sd, f"{prefix}.bias")


class _NoiseInjection(nn.Module):
    def __init__(self, sd, prefix):
        super().__init__()
        self.weight = _param(sd, f"{prefix}.weight")


class _ModConv(nn.Module):
    """multi_stylegan_generator.py:295-348: blur child (paramless), direct
    weight, then the modulation_mapping child."""

    def __init__(self, sd, prefix, mm):
        super().__init__()
        self.blur = nn.Identity()
        self.weight = _param(sd, f"{prefix}.weight")
        self.modulation_mapping = (
            _EqLinear(sd, f"{prefix}.modulation_mapping", bias=True) if mm
            else None)


class _StyledConv(nn.Module):
    """multi_stylegan_generator.py:417-450."""

    def __init__(self, sd, prefix, mm):
        super().__init__()
        self.modulated_convolution = _ModConv(
            sd, f"{prefix}.modulated_convolution", mm)
        self.noise_injection = _NoiseInjection(sd, f"{prefix}.noise_injection")
        self.activation = _FusedLReLU(sd, f"{prefix}.activation")


class _OutputBlock(nn.Module):
    """multi_stylegan_generator.py:472-510: upsampling + modulated_convolution
    children registered BEFORE the direct ``bias`` parameter — torch still
    yields the direct param first, which is exactly what this replica
    verifies."""

    def __init__(self, sd, prefix, mm):
        super().__init__()
        self.upsampling = nn.Identity()
        self.modulated_convolution = _ModConv(
            sd, f"{prefix}.modulated_convolution", mm)
        self.bias = _param(sd, f"{prefix}.bias")


class _ConstantInput(nn.Module):
    def __init__(self, sd, prefix):
        super().__init__()
        self.input = _param(sd, f"{prefix}.input")


class _StyleMapping(nn.Module):
    """multi_stylegan_generator.py:208-226: Sequential [PixelNorm,
    (EqualizedLinear(bias=False), FusedLeakyReLU) * depth]."""

    def __init__(self, sd, depth):
        super().__init__()
        layers = [nn.Identity()]
        for i in range(depth):
            layers.append(
                _EqLinear(sd, f"style_mapping.layers.{1 + 2 * i}", bias=False))
            layers.append(_FusedLReLU(sd, f"style_mapping.layers.{2 + 2 * i}"))
        self.layers = nn.Sequential(*layers)


class _GeneratorReplica(nn.Module):
    """Attribute assignment order mirrors multi_stylegan_generator.py:34-96;
    get_parameters mirrors :97-112 (style mapping LAST, at lr/100)."""

    def __init__(self, sd, cfg):
        super().__init__()
        self.style_mapping = _StyleMapping(sd, cfg.depth_style_mapping)
        self.constant_input_1 = _ConstantInput(sd, "constant_input_1")
        self.constant_input_2 = _ConstantInput(sd, "constant_input_2")
        self.starting_convolution_1 = _StyledConv(sd, "starting_convolution_1", True)
        self.starting_convolution_2 = _StyledConv(sd, "starting_convolution_2", False)
        self.starting_output_block_1 = _OutputBlock(sd, "starting_output_block_1", True)
        self.starting_output_block_2 = _OutputBlock(sd, "starting_output_block_2", False)
        self.main_convolutions_1 = nn.ModuleList()
        self.output_blocks_1 = nn.ModuleList()
        self.main_convolutions_2 = nn.ModuleList()
        self.output_blocks_2 = nn.ModuleList()
        for i in range(2 * cfg.n_stages):
            self.main_convolutions_1.append(
                _StyledConv(sd, f"main_convolutions_1.{i}", True))
            self.main_convolutions_2.append(
                _StyledConv(sd, f"main_convolutions_2.{i}", False))
        for i in range(cfg.n_stages):
            self.output_blocks_1.append(
                _OutputBlock(sd, f"output_blocks_1.{i}", True))
            self.output_blocks_2.append(
                _OutputBlock(sd, f"output_blocks_2.{i}", False))
        self.noises = nn.Module()
        for k, v in sd.items():
            if k.startswith("noises."):
                self.noises.register_buffer(k.split(".", 1)[1], v)

    def get_parameters(self, lr_main, lr_style):
        return [
            {"params": self.constant_input_1.parameters(), "lr": lr_main},
            {"params": self.starting_convolution_1.parameters(), "lr": lr_main},
            {"params": self.starting_output_block_1.parameters(), "lr": lr_main},
            {"params": self.main_convolutions_1.parameters(), "lr": lr_main},
            {"params": self.output_blocks_1.parameters(), "lr": lr_main},
            {"params": self.constant_input_2.parameters(), "lr": lr_main},
            {"params": self.starting_convolution_2.parameters(), "lr": lr_main},
            {"params": self.starting_output_block_2.parameters(), "lr": lr_main},
            {"params": self.main_convolutions_2.parameters(), "lr": lr_main},
            {"params": self.output_blocks_2.parameters(), "lr": lr_main},
            {"params": self.style_mapping.parameters(), "lr": lr_style},
        ]


class _ResNetBlock(nn.Module):
    """u_net_2d_discriminator.py:143-173."""

    def __init__(self, sd, prefix):
        super().__init__()
        self.mini_batch_std_dev = nn.Identity()
        self.main_mapping = nn.Sequential(
            _EqConv(sd, f"{prefix}.main_mapping.0", bias=False),
            _FusedLReLU(sd, f"{prefix}.main_mapping.1"),
            _EqConv(sd, f"{prefix}.main_mapping.2", bias=False),
            _FusedLReLU(sd, f"{prefix}.main_mapping.3"),
        )
        rw = f"{prefix}.residual_mapping.weight"
        self.residual_mapping = (
            _EqConv(sd, f"{prefix}.residual_mapping", bias=False)
            if rw in sd else nn.Identity())


class _NonLocalBlock(nn.Module):
    """u_net_2d_discriminator.py:335-358: conv children, then the direct
    gamma parameter (torch yields gamma first)."""

    def __init__(self, sd, prefix):
        super().__init__()
        self.theta = _EqConv(sd, f"{prefix}.theta", bias=False)
        self.phi = _EqConv(sd, f"{prefix}.phi", bias=False)
        self.g = _EqConv(sd, f"{prefix}.g", bias=False)
        self.o = _EqConv(sd, f"{prefix}.o", bias=False)
        rw = f"{prefix}.residual_mapping.weight"
        self.residual_mapping = (
            _EqConv(sd, f"{prefix}.residual_mapping", bias=False)
            if rw in sd else nn.Identity())
        self.register_parameter(
            "gamma", nn.Parameter(sd[f"{prefix}.gamma"].detach().clone()))


class _DiscriminatorReplica(nn.Module):
    """Attribute assignment order mirrors u_net_2d_discriminator.py:33-101."""

    def __init__(self, sd, cfg):
        super().__init__()
        n_enc = len(cfg.encoder_channels)
        self.encoder_blocks = nn.ModuleList(
            (_NonLocalBlock if i == 2 else _ResNetBlock)(sd, f"encoder_blocks.{i}")
            for i in range(n_enc))
        self.downscale_convolutions = nn.ModuleList(
            nn.Sequential(
                _EqConv(sd, f"downscale_convolutions.{i}.0", bias=True),
                nn.Identity())
            for i in range(n_enc - 1))
        self.classification_head = nn.Sequential(
            nn.Identity(), nn.Identity(),
            _EqLinear(sd, "classification_head.2", bias=False),
            _FusedLReLU(sd, "classification_head.3"),
            _EqLinear(sd, "classification_head.4", bias=False),
        )
        self.decoder_blocks = nn.ModuleList(
            (_NonLocalBlock if i == 1 else _ResNetBlock)(sd, f"decoder_blocks.{i}")
            for i in range(len(cfg.decoder_channels)))
        self.transposed_convolutions = nn.ModuleList(
            nn.Sequential(nn.Identity(),
                          _EqConv(sd, f"transposed_convolutions.{i}.1", bias=False))
            for i in range(len(cfg.decoder_channels)))
        self.final_mapping = nn.Sequential(
            _FusedLReLU(sd, "final_mapping.0"),
            _EqConv(sd, "final_mapping.1", bias=False),
        )


def _index_to_name(optimizer, model):
    """Global Adam param-index -> named_parameters name."""
    name_of = {id(p): n for n, p in model.named_parameters()}
    return [name_of[id(p)] for g in optimizer.param_groups for p in g["params"]]


def _step_adam(optimizer, model, seed, scale=1e-3):
    g = torch.Generator().manual_seed(seed)
    grads = {}
    for name, p in model.named_parameters():
        grads[name] = torch.randn(p.shape, generator=g) * scale
        p.grad = grads[name].clone()
    optimizer.step()
    return grads


@pytest.fixture(scope="module")
def trained_replicas():
    gcfg, dcfg = tiny_generator_config(), tiny_discriminator_config()
    g_sd = _fake_generator_state_dict(gcfg)
    d_sd = strip_prefixes(_fake_discriminator_state_dict(dcfg))
    gen = _GeneratorReplica(g_sd, gcfg)
    dis = _DiscriminatorReplica(d_sd, dcfg)
    cfg = TrainingConfig()
    g_opt = torch.optim.Adam(
        gen.get_parameters(lr_main=cfg.lr_generator,
                           lr_style=cfg.lr_generator * cfg.lr_style_factor),
        betas=(cfg.adam_beta1, cfg.adam_beta2))
    d_opt = torch.optim.Adam(dis.parameters(), lr=cfg.lr_discriminator,
                             betas=(cfg.adam_beta1, cfg.adam_beta2))
    for seed in range(3):
        _step_adam(g_opt, gen, seed)
        _step_adam(d_opt, dis, 100 + seed)
    return gcfg, dcfg, gen, dis, g_opt, d_opt


def test_generator_adam_order_matches_torch(trained_replicas):
    gcfg, _, gen, _, g_opt, _ = trained_replicas
    expected = _index_to_name(g_opt, gen)
    got = [key for key, _, _ in generator_adam_order(gcfg)]
    assert got == expected


def test_discriminator_adam_order_matches_torch(trained_replicas):
    _, dcfg, _, dis, _, d_opt = trained_replicas
    expected = _index_to_name(d_opt, dis)
    got = [key for key, _, _ in
           discriminator_adam_order(dict(dis.state_dict()), dcfg)]
    assert got == expected


def _assert_tree_allclose(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), rtol=1e-6, atol=1e-8,
            err_msg=jax.tree_util.keystr(path))


def test_converted_moments_equal_param_conversion_of_exp_avg(trained_replicas):
    """All moment leaves at once: converting a state_dict whose values ARE
    the exp_avg tensors must give exactly the mu tree (same transforms)."""
    gcfg, dcfg, gen, dis, g_opt, d_opt = trained_replicas
    g_sd, d_sd = dict(gen.state_dict()), dict(dis.state_dict())

    g_adam = convert_adam_state(
        g_opt.state_dict(), generator_adam_order(gcfg), g_sd)
    d_adam = convert_adam_state(
        d_opt.state_dict(), discriminator_adam_order(d_sd, dcfg), d_sd)
    assert g_adam["count"] == 3 and d_adam["count"] == 3

    def exp_avg_sd(model, opt, base_sd, field):
        names = _index_to_name(opt, model)
        state = opt.state_dict()["state"]
        idxs = [i for g in opt.state_dict()["param_groups"] for i in g["params"]]
        sd = dict(base_sd)  # keep buffers (noises) for the converter
        for pos, name in enumerate(names):
            sd[name] = state[idxs[pos]][field]
        return sd

    mu_as_params = convert_generator(
        exp_avg_sd(gen, g_opt, g_sd, "exp_avg"), gcfg)["params"]
    _assert_tree_allclose(g_adam["mu"], mu_as_params)
    nu_as_params = convert_discriminator(
        exp_avg_sd(dis, d_opt, d_sd, "exp_avg_sq"), dcfg)["params"]
    _assert_tree_allclose(d_adam["nu"], nu_as_params)
    # moment trees are shaped exactly like the param trees
    assert (jax.tree.structure(g_adam["mu"])
            == jax.tree.structure(convert_generator(g_sd, gcfg)["params"]))


def test_install_and_next_step_matches_torch(trained_replicas, tmp_path):
    """The gold test: install converted moments into the optax state, apply
    one more update with identical grads, and the params must match torch's
    4th Adam step — count/bias-correction/moment semantics all line up."""
    import copy

    gcfg, dcfg, gen0, dis0, g_opt0, d_opt0 = trained_replicas
    # deepcopy model+optimizer TOGETHER so the copy's optimizer still points
    # at the copy's params (don't mutate the module-scoped fixture)
    gen, g_opt = copy.deepcopy((gen0, g_opt0))
    dis, d_opt = copy.deepcopy((dis0, d_opt0))

    ckpt = {
        "generator": dict(gen.state_dict()),
        "generator_ema": dict(gen.state_dict()),
        "discriminator": dict(dis.state_dict()),
        "generator_optimizer": g_opt.state_dict(),
        "discriminator_optimizer": d_opt.state_dict(),
    }
    path = tmp_path / "checkpoint_3.pt"
    torch.save(ckpt, path)
    converted = convert_reference_checkpoint(str(path), gcfg, dcfg)
    assert converted["generator_adam"]["count"] == 3

    from multi_stylegan_tpu.train.state import (
        install_adam_moments,
        make_discriminator_optimizer,
        make_generator_optimizer,
    )

    cfg = TrainingConfig()
    g_params = jax.tree.map(jnp.asarray, converted["generator"]["params"])
    d_params = jax.tree.map(jnp.asarray, converted["discriminator"]["params"])
    g_tx, d_tx = make_generator_optimizer(cfg), make_discriminator_optimizer(cfg)
    g_state = install_adam_moments(
        g_tx.init(g_params), **converted["generator_adam"])
    d_state = install_adam_moments(
        d_tx.init(d_params), **converted["discriminator_adam"])

    # identical 4th-step grads on both sides (small: global norm << clip 5.0)
    g_grads_t = _step_adam(g_opt, gen, 7)
    d_grads_t = _step_adam(d_opt, dis, 107)
    g_noise = {k: v for k, v in gen.state_dict().items() if k.startswith("noises.")}
    g_grads = convert_generator({**g_grads_t, **g_noise}, gcfg)["params"]
    d_grads = convert_discriminator(d_grads_t, dcfg)["params"]

    g_upd, _ = g_tx.update(jax.tree.map(jnp.asarray, g_grads), g_state, g_params)
    d_upd, _ = d_tx.update(jax.tree.map(jnp.asarray, d_grads), d_state, d_params)
    import optax

    g_new = optax.apply_updates(g_params, g_upd)
    d_new = optax.apply_updates(d_params, d_upd)

    g_torch_new = convert_generator(dict(gen.state_dict()), gcfg)["params"]
    d_torch_new = convert_discriminator(dict(dis.state_dict()), dcfg)["params"]
    for ours, torchs in ((g_new, g_torch_new), (d_new, d_torch_new)):
        flat_t = dict(jax.tree_util.tree_leaves_with_path(torchs))
        for p, leaf in jax.tree_util.tree_leaves_with_path(ours):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_t[p]), rtol=2e-5, atol=1e-7,
                err_msg=jax.tree_util.keystr(p))
