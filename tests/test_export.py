"""Reverse checkpoint export (io/torch_convert.py export_* + cli.export).

The reference's resume path loads all six checkpoint keys unconditionally
(reference train_multi_stylegan.py:73-86); these tests prove a framework
state exports into exactly that format: torch's own Module.load_state_dict
and Adam.load_state_dict accept the exported dicts and continue the
trajectory, and a convert(export(x)) round trip is the identity.
"""

from __future__ import annotations

import numpy as np
import torch

import jax
import jax.numpy as jnp

from multi_stylegan_tpu.io.torch_convert import (
    convert_reference_checkpoint,
    export_reference_checkpoint,
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
from tests.test_optim_convert import (
    _DiscriminatorReplica,
    _GeneratorReplica,
    _step_adam,
)


def _make_source_checkpoint(tmp_path, steps=3):
    """A reference-format .pt from real torch replicas + real torch Adam."""
    gcfg, dcfg = tiny_generator_config(), tiny_discriminator_config()
    gen = _GeneratorReplica(_fake_generator_state_dict(gcfg), gcfg)
    dis = _DiscriminatorReplica(
        strip_prefixes(_fake_discriminator_state_dict(dcfg)), dcfg)
    cfg = TrainingConfig()
    g_opt = torch.optim.Adam(
        gen.get_parameters(cfg.lr_generator, cfg.lr_generator * 0.01),
        betas=(cfg.adam_beta1, cfg.adam_beta2))
    d_opt = torch.optim.Adam(dis.parameters(), lr=cfg.lr_discriminator,
                             betas=(cfg.adam_beta1, cfg.adam_beta2))
    for s in range(steps):
        _step_adam(g_opt, gen, s)
        _step_adam(d_opt, dis, 60 + s)
    path = tmp_path / "checkpoint_src.pt"
    torch.save({
        "generator": dict(gen.state_dict()),
        "generator_ema": dict(gen.state_dict()),
        "discriminator": {f"discriminator.{k}": v
                          for k, v in dis.state_dict().items()},
        "generator_optimizer": g_opt.state_dict(),
        "discriminator_optimizer": d_opt.state_dict(),
        "path_length_regularization": {},
    }, path)
    return str(path), gcfg, dcfg, gen, dis, g_opt, d_opt


def _export_from_converted(path, gcfg, dcfg):
    cfg = TrainingConfig()
    converted = convert_reference_checkpoint(path, gcfg, dcfg)
    return export_reference_checkpoint(
        converted["generator"]["params"], converted["generator"]["noises"],
        converted["generator_ema"]["params"],
        converted["discriminator"]["params"], gcfg, dcfg,
        g_adam=converted["generator_adam"],
        d_adam=converted["discriminator_adam"],
        lr_generator=cfg.lr_generator, lr_discriminator=cfg.lr_discriminator,
        lr_style_factor=cfg.lr_style_factor,
        adam_betas=(cfg.adam_beta1, cfg.adam_beta2))


def test_convert_export_round_trip_is_identity(tmp_path):
    path, gcfg, dcfg, *_ = _make_source_checkpoint(tmp_path)
    exported = _export_from_converted(path, gcfg, dcfg)
    out = tmp_path / "checkpoint_rt.pt"
    torch.save(exported, out)
    a = convert_reference_checkpoint(path, gcfg, dcfg)
    b = convert_reference_checkpoint(str(out), gcfg, dcfg)
    for key in ("generator", "generator_ema", "discriminator"):
        fa = jax.tree_util.tree_leaves_with_path(a[key])
        fb = dict(jax.tree_util.tree_leaves_with_path(b[key]))
        assert jax.tree.structure(a[key]) == jax.tree.structure(b[key])
        for p, leaf in fa:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(fb[p]), err_msg=str(p))
    for key in ("generator_adam", "discriminator_adam"):
        assert a[key]["count"] == b[key]["count"] == 3
        for field in ("mu", "nu"):
            fa = jax.tree_util.tree_leaves_with_path(a[key][field])
            fb = dict(jax.tree_util.tree_leaves_with_path(b[key][field]))
            for p, leaf in fa:
                np.testing.assert_array_equal(np.asarray(leaf),
                                              np.asarray(fb[p]),
                                              err_msg=f"{key}.{field}{p}")


def test_exported_state_dicts_load_into_torch(tmp_path):
    """torch's own strict-ish load accepts the exported model dicts: no
    missing keys; the only unexpected ones are the deterministic blur
    buffers our replicas model as Identity."""
    path, gcfg, dcfg, gen, dis, _, _ = _make_source_checkpoint(tmp_path)
    exported = _export_from_converted(path, gcfg, dcfg)

    res = gen.load_state_dict(
        {k: torch.as_tensor(v) for k, v in exported["generator"].items()},
        strict=False)
    assert res.missing_keys == []
    assert all(".blur.kernel" in k or ".upsampling.kernel" in k
               for k in res.unexpected_keys), res.unexpected_keys

    d_sd = strip_prefixes(exported["discriminator"])
    res = dis.load_state_dict(
        {k: torch.as_tensor(v) for k, v in d_sd.items()}, strict=False)
    assert res.missing_keys == []
    assert all(k.endswith(".kernel") for k in res.unexpected_keys), \
        res.unexpected_keys

    # blur buffers match the reference constructors (make_kernel sum-
    # normalized outer product; upsampling Blur gain sampling_factor**2)
    k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32) / 64.0
    np.testing.assert_allclose(
        exported["generator"]
        ["main_convolutions_1.0.modulated_convolution.blur.kernel"], k * 4.0)
    np.testing.assert_allclose(
        exported["discriminator"]["discriminator.downscale_convolutions.0.1."
                                  "kernel"], k)


def test_exported_adam_state_continues_torch_trajectory(tmp_path):
    """Load the exported optimizer into a FRESH torch Adam and take one more
    step: it must match the original optimizer's next step exactly."""
    path, gcfg, dcfg, gen, dis, g_opt, d_opt = _make_source_checkpoint(tmp_path)
    exported = _export_from_converted(path, gcfg, dcfg)

    gen2 = _GeneratorReplica(_fake_generator_state_dict(gcfg), gcfg)
    gen2.load_state_dict(
        {k: torch.as_tensor(v) for k, v in exported["generator"].items()},
        strict=False)
    cfg = TrainingConfig()
    g_opt2 = torch.optim.Adam(
        gen2.get_parameters(cfg.lr_generator, cfg.lr_generator * 0.01),
        betas=(cfg.adam_beta1, cfg.adam_beta2))
    g_opt2.load_state_dict(exported["generator_optimizer"])

    _step_adam(g_opt, gen, 9)
    _step_adam(g_opt2, gen2, 9)
    sd1, sd2 = gen.state_dict(), gen2.state_dict()
    for k in sd1:
        if k.startswith("noises."):
            continue
        np.testing.assert_allclose(sd1[k].numpy(), sd2[k].numpy(),
                                   rtol=1e-6, atol=1e-8, err_msg=k)


def test_export_cli_round_trip(tmp_path):
    """convert CLI -> orbax -> export CLI -> reference 6-key .pt."""
    path, gcfg, dcfg, *_ = _make_source_checkpoint(tmp_path)
    from multi_stylegan_tpu.cli import convert as convert_cli
    from multi_stylegan_tpu.cli import export as export_cli

    orbax_dir = str(tmp_path / "orbax")
    convert_cli.main([path, orbax_dir, "--tiny"])
    out_pt = str(tmp_path / "checkpoint_export.pt")
    export_cli.main([orbax_dir, out_pt, "--tiny"])

    ckpt = torch.load(out_pt, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"generator", "generator_ema", "generator_optimizer",
                         "discriminator", "discriminator_optimizer",
                         "path_length_regularization"}
    assert ckpt["path_length_regularization"] == {}
    b = convert_reference_checkpoint(out_pt, gcfg, dcfg)
    a = convert_reference_checkpoint(path, gcfg, dcfg)
    assert a["generator_adam"]["count"] == b["generator_adam"]["count"] == 3
    fa = jax.tree_util.tree_leaves_with_path(a["generator"]["params"])
    fb = dict(jax.tree_util.tree_leaves_with_path(b["generator"]["params"]))
    for p, leaf in fa:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(fb[p]),
                                   rtol=1e-6, atol=1e-7, err_msg=str(p))
