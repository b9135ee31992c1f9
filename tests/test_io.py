"""IO tests: logger contract, orbax round-trip, torch-checkpoint converter."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multi_stylegan_tpu.io import (
    Logger,
    load_checkpoint,
    save_checkpoint,
    convert_discriminator,
    convert_generator,
)
from multi_stylegan_tpu.models import (
    Discriminator,
    Generator,
    tiny_discriminator_config,
    tiny_generator_config,
)


def test_logger_directory_contract(tmp_path):
    log = Logger(experiment_path=str(tmp_path / "exp"))
    for sub in ("metrics", "hyperparameters", "plots", "models"):
        assert os.path.isdir(tmp_path / "exp" / sub)
    log.log_metric("loss", 1.0)
    log.log_metric("loss", 2.0)
    log.log_hyperparameter("lr", 1e-4)
    log.log_hyperparameter(hyperparameter_dict={"batch": 24})
    log.save()
    vals = np.load(tmp_path / "exp" / "metrics" / "loss.npy")
    np.testing.assert_array_equal(vals, [1.0, 2.0])
    hp = json.load(open(tmp_path / "exp" / "hyperparameters" / "hyperparameter.txt"))
    assert hp["lr"] == ["0.0001"] and hp["batch"] == ["24"]


def test_logger_temp_metrics(tmp_path):
    log = Logger(experiment_path=str(tmp_path / "exp"))
    log.log_temp_metric("fid", 10.0)
    log.log_temp_metric("fid", 20.0)
    out = log.save_temp_metric("fid")
    assert out["fid"] == 15.0
    assert log.metrics["fid"] == [15.0]


def test_logger_save_prediction(tmp_path):
    log = Logger(experiment_path=str(tmp_path / "exp"))
    pred = np.random.default_rng(0).uniform(size=(2, 2, 3, 8, 8)).astype(np.float32)
    log.save_prediction(pred, "sample")
    files = sorted(os.listdir(tmp_path / "exp" / "plots"))
    assert files == [
        "sample_bf_0.png", "sample_bf_1.png", "sample_gfp_0.png", "sample_gfp_1.png",
    ]
    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "exp" / "plots" / "sample_gfp_0.png"))
    assert img.shape == (8, 24, 3)
    assert img[..., 0].max() == 0 and img[..., 2].max() == 0  # green tint only


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6.0).reshape(2, 3),
        "b": {"c": jnp.asarray(3, jnp.int32)},
    }
    save_checkpoint(str(tmp_path / "ckpt"), tree)
    restored = load_checkpoint(str(tmp_path / "ckpt"), template=tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))
    assert int(restored["b"]["c"]) == 3


def test_checkpoint_structure_mismatch_hint(tmp_path):
    """Restoring across the skip_nonfinite_updates format boundary (optax
    apply_if_finite wraps the optimizer-state pytree) must fail with a
    pointed migration message, not a bare orbax structure error."""
    import optax

    params = {"w": jnp.arange(4.0)}
    opt_plain = optax.adam(1e-3)
    opt_guarded = optax.apply_if_finite(optax.adam(1e-3), 100)
    save_checkpoint(str(tmp_path / "old"), {"opt": opt_plain.init(params)})
    with pytest.raises(Exception, match="skip_nonfinite_updates"):
        load_checkpoint(str(tmp_path / "old"),
                        template={"opt": opt_guarded.init(params)})


def _fake_generator_state_dict(cfg):
    """Build a torch state_dict with the reference's names/shapes (SURVEY
    §2.3), random values."""
    g = torch.Generator().manual_seed(0)
    sd = {}
    D = cfg.latent_dimensions
    ch = cfg.stage_channels
    for i in range(cfg.depth_style_mapping):
        sd[f"style_mapping.layers.{1 + 2 * i}.weight"] = torch.randn(D, D, generator=g)
        sd[f"style_mapping.layers.{2 + 2 * i}.bias"] = torch.randn(D, generator=g)

    def modconv(prefix, cin, cout, k, mm=True):
        sd[f"{prefix}.weight"] = torch.randn(1, cout, cin, k, k, generator=g)
        if mm:
            sd[f"{prefix}.modulation_mapping.weight"] = torch.randn(cin, D, generator=g)
            sd[f"{prefix}.modulation_mapping.bias"] = torch.ones(cin)

    def styled(prefix, cin, cout, k, mm):
        modconv(f"{prefix}.modulated_convolution", cin, cout, k, mm)
        sd[f"{prefix}.noise_injection.weight"] = torch.zeros(1)
        sd[f"{prefix}.activation.bias"] = torch.randn(cout, generator=g)

    def outblock(prefix, cin, mm):
        modconv(f"{prefix}.modulated_convolution", cin, cfg.sequence_length, 1, mm)
        sd[f"{prefix}.bias"] = torch.randn(1, 1, 1, 1, generator=g)

    h0, w0 = cfg.starting_resolution
    for t, mm in ((1, True), (2, False)):
        sd[f"constant_input_{t}.input"] = torch.ones(1, ch[0], h0, w0)
        styled(f"starting_convolution_{t}", ch[0], ch[0], 3, mm)
        outblock(f"starting_output_block_{t}", ch[0], mm)
        for i in range(cfg.n_stages):
            styled(f"main_convolutions_{t}.{2 * i}", ch[i], ch[i + 1], 2, mm)
            styled(f"main_convolutions_{t}.{2 * i + 1}", ch[i + 1], ch[i + 1], 3, mm)
            outblock(f"output_blocks_{t}.{i}", ch[i + 1], mm)
    sd["noises.noise_start"] = torch.randn(1, 1, h0, w0, generator=g)
    for i in range(cfg.n_stages):
        r = h0 * 2 ** (i + 1)
        sd[f"noises.noise_{2 * i}"] = torch.randn(1, 1, r, r, generator=g)
        sd[f"noises.noise_{2 * i + 1}"] = torch.randn(1, 1, r, r, generator=g)
    return sd


def test_convert_generator_structure_matches_model():
    cfg = tiny_generator_config()
    sd = _fake_generator_state_dict(cfg)
    converted = convert_generator(sd, cfg)
    model = Generator(cfg)
    ref_vars = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "mixing": jax.random.key(2)},
        jnp.zeros((1, cfg.latent_dimensions)),
    )
    # identical tree structure and leaf shapes
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_vars["params"])
    got_shapes = jax.tree.map(lambda x: x.shape, converted["params"])
    assert ref_shapes == got_shapes
    ref_nshapes = jax.tree.map(lambda x: x.shape, ref_vars["noises"])
    got_nshapes = jax.tree.map(lambda x: x.shape, converted["noises"])
    assert ref_nshapes == got_nshapes
    # converted params drive the model
    img = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted["params"]),
         "noises": jax.tree.map(jnp.asarray, converted["noises"])},
        jax.random.normal(jax.random.key(3), (2, cfg.latent_dimensions)),
        randomize_noise=False,
    )
    assert img.shape == (2, 2, 3, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def _fake_discriminator_state_dict(cfg):
    g = torch.Generator().manual_seed(1)
    sd = {}

    def resnet(prefix, cin, cout, mbstd=False):
        cin_eff = cin + 1 if mbstd else cin
        sd[f"{prefix}.main_mapping.0.weight"] = torch.randn(cout, cin_eff, 3, 3, generator=g)
        sd[f"{prefix}.main_mapping.1.bias"] = torch.randn(cout, generator=g)
        sd[f"{prefix}.main_mapping.2.weight"] = torch.randn(cout, cout, 3, 3, generator=g)
        sd[f"{prefix}.main_mapping.3.bias"] = torch.randn(cout, generator=g)
        if cin != cout:
            sd[f"{prefix}.residual_mapping.weight"] = torch.randn(cout, cin, 1, 1, generator=g)

    def nonlocal_block(prefix, cin, cout):
        sd[f"{prefix}.theta.weight"] = torch.randn(cout // 8, cin, 1, 1, generator=g)
        sd[f"{prefix}.phi.weight"] = torch.randn(cout // 8, cin, 1, 1, generator=g)
        sd[f"{prefix}.g.weight"] = torch.randn(cout // 2, cin, 1, 1, generator=g)
        sd[f"{prefix}.o.weight"] = torch.randn(cout, cout // 2, 1, 1, generator=g)
        if cin != cout:
            sd[f"{prefix}.residual_mapping.weight"] = torch.randn(cout, cin, 1, 1, generator=g)
        sd[f"{prefix}.gamma"] = torch.tensor(0.0)

    enc = cfg.encoder_channels
    n_enc = len(enc)
    cin0 = cfg.input_channels
    for i, (cin, cout) in enumerate(enc):
        cin = cin0 if i == 0 else cin
        if i == 2:
            nonlocal_block(f"encoder_blocks.{i}", cin, cout)
        else:
            resnet(f"encoder_blocks.{i}", cin, cout, mbstd=i >= n_enc - 2)
        if i != n_enc - 1:
            sd[f"downscale_convolutions.{i}.0.weight"] = torch.randn(cout, cout, 3, 3, generator=g)
            sd[f"downscale_convolutions.{i}.0.bias"] = torch.randn(cout, generator=g)
    sd["classification_head.2.weight"] = torch.randn(128, enc[-1][-1], generator=g)
    sd["classification_head.3.bias"] = torch.randn(128, generator=g)
    sd["classification_head.4.weight"] = torch.randn(1, 128, generator=g)
    past = [e[-1] for e in enc[:-1]]
    for i, (din, dout) in enumerate(cfg.decoder_channels):
        cur = enc[-1][-1] if i == 0 else cfg.decoder_channels[i - 1][-1]
        sd[f"transposed_convolutions.{i}.1.weight"] = torch.randn(
            din - past[-(i + 1)], cur, 1, 1, generator=g)
        if i == 1:
            nonlocal_block(f"decoder_blocks.{i}", din, dout)
        else:
            resnet(f"decoder_blocks.{i}", din, dout)
    sd["final_mapping.0.bias"] = torch.randn(cfg.decoder_channels[-1][-1], generator=g)
    sd["final_mapping.1.weight"] = torch.randn(1, cfg.decoder_channels[-1][-1], 1, 1, generator=g)
    # wrappers add prefixes; converter must strip them
    return {"discriminator.module." if False else "discriminator." + k: v
            for k, v in sd.items()}


def test_convert_discriminator_structure_matches_model():
    cfg = tiny_discriminator_config()
    sd = _fake_discriminator_state_dict(cfg)
    converted = convert_discriminator(sd, cfg)
    model = Discriminator(cfg)
    ref_vars = model.init(jax.random.key(0), jnp.zeros((1, 2, 3, 32, 32)))
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_vars["params"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, converted["params"])
    assert ref_shapes == got_shapes
    s, p = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted["params"])},
        jax.random.normal(jax.random.key(1), (2, 2, 3, 32, 32)),
    )
    assert s.shape == (2, 1) and p.shape == (2, 1, 1, 32, 32)
