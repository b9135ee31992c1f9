"""CLI smoke tests: the three public entry points run end-to-end on CPU
(reference public surface: train_multi_stylegan.py + scripts/, SURVEY §3.5)."""

import os
import subprocess
import sys

import pytest

_ENV = dict(os.environ, XLA_FLAGS="--xla_force_host_platform_device_count=2")


def _run(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", *args], cwd="/root/repo", env=dict(_ENV, HOME=str(cwd)),
        capture_output=True, text=True, timeout=900,
    )


@pytest.mark.slow
def test_cli_train_synthetic_tiny(tmp_path):
    r = _run(
        ["multi_stylegan_tpu.cli.train", "--synthetic", "--tiny", "--epochs", "1",
         "--batch_size", "4", "--no_validation_metrics", "--platform", "cpu",
         "--devices", "2",
         "--experiment_path", str(tmp_path / "exp")],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Start training" in r.stdout
    assert os.path.isdir(tmp_path / "exp" / "plots")
    plots = os.listdir(tmp_path / "exp" / "plots")
    assert any(p.startswith("prediction_ema_1") for p in plots), plots


@pytest.mark.slow
def test_cli_sample_and_interpolate(tmp_path):
    r = _run(
        ["multi_stylegan_tpu.cli.sample", "--tiny", "--samples", "3",
         "--batch_size", "2", "--platform", "cpu",
         "--output", str(tmp_path / "samples")],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    files = os.listdir(tmp_path / "samples")
    assert sum(f.endswith(".png") for f in files) == 6  # 3 samples x 2 domains

    r = _run(
        ["multi_stylegan_tpu.cli.interpolate", "--tiny", "--anchors", "3",
         "--frames", "8", "--batch_size", "4", "--fps", "10", "--platform", "cpu",
         "--output", str(tmp_path / "interp")],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(tmp_path / "interp" / "interpolation.gif")


@pytest.mark.slow
def test_cli_convert_reference_checkpoint(tmp_path):
    """convert CLI: fake reference 6-key .pt -> orbax TrainState dir that
    load_checkpoint restores with converted params and stamped step."""
    import torch

    from tests.test_io import (
        _fake_discriminator_state_dict,
        _fake_generator_state_dict,
    )
    from multi_stylegan_tpu.models.config import (
        tiny_discriminator_config,
        tiny_generator_config,
    )

    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    ckpt = {
        "generator": _fake_generator_state_dict(gcfg),
        "generator_ema": _fake_generator_state_dict(gcfg),
        "discriminator": _fake_discriminator_state_dict(dcfg),
        "generator_optimizer": {},
        "discriminator_optimizer": {},
        "path_length_regularization": {
            "mean_path_length": torch.tensor(2.5)},
    }
    src = tmp_path / "checkpoint_5.pt"
    torch.save(ckpt, str(src))
    dest = tmp_path / "orbax"

    r = _run(
        ["multi_stylegan_tpu.cli.convert", str(src), str(dest),
         "--tiny", "--step", "123", "--platform", "cpu"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    from multi_stylegan_tpu.io import load_checkpoint

    restored = load_checkpoint(str(dest))
    assert int(restored["step"]) == 123
    assert float(restored["mean_path_length"]) == 2.5
    import numpy as np

    ema_leaves = [x for x in __import__("jax").tree.leaves(restored["g_ema_params"])]
    assert all(np.isfinite(np.asarray(l)).all() for l in ema_leaves)
