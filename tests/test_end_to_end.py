"""End-to-end smoke test (SURVEY.md §4 item 5): tiny config, synthetic data,
one epoch through the Trainer, sample grids, checkpoint round-trip."""

import os

import jax
import numpy as np
import pytest

from multi_stylegan_tpu.data import BatchLoader, SyntheticTLFMDataset
from multi_stylegan_tpu.io import Logger
from multi_stylegan_tpu.models import (
    Discriminator,
    Generator,
    tiny_discriminator_config,
    tiny_generator_config,
)
from multi_stylegan_tpu.models.config import TrainingConfig
from multi_stylegan_tpu.train.loop import Trainer


@pytest.mark.slow
def test_trainer_one_epoch(tmp_path):
    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    cfg = TrainingConfig(
        batch_size=4,
        lazy_generator_regularization=2,
        lazy_discriminator_regularization=2,
        validate_every_n_epochs=1,
        checkpoint_every_n_epochs=1,
    )
    data = BatchLoader(
        SyntheticTLFMDataset(n_samples=8, resolution=(32, 32)),
        batch_size=4, seed=0, num_workers=1,
    )
    logger = Logger(experiment_path=str(tmp_path / "exp"))

    calls = {}

    def fake_metric(generator_apply, dataset):
        z = jax.random.normal(jax.random.key(0), (2, gcfg.latent_dimensions))
        img = generator_apply(z, None, jax.random.key(1))
        calls["shape"] = img.shape
        return (1.0, 2.0)

    trainer = Trainer(
        Generator(gcfg), Discriminator(dcfg), cfg,
        training_dataset=data, data_logger=logger,
        validation_metrics=(fake_metric,), epochs=1,
    )
    state = trainer.train()

    assert int(jax.device_get(state.step)) == 2  # 8 samples / batch 4
    # losses logged and finite
    for name in ("loss_discriminator_real", "loss_generator", "seqs_per_sec"):
        assert name in logger.metrics
        assert np.isfinite(logger.metrics[name]).all()
    # validation metric called with working generator handle
    assert calls["shape"] == (2, 2, 3, 32, 32)
    assert "function_bf" in logger.metrics or any(
        k.endswith("_bf") for k in logger.metrics
    )
    # sample grids written
    plots = os.listdir(tmp_path / "exp" / "plots")
    assert any(p.startswith("prediction_ema_1") for p in plots)
    # checkpoint written and restorable
    assert trainer.ckpt.latest_step() == 2
    restored = trainer.ckpt.restore(trainer.state)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored.step)),
        np.asarray(jax.device_get(state.step)),
    )
    a = jax.tree.leaves(restored.g_params)[0]
    b = jax.tree.leaves(state.g_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    trainer.ckpt.close()


@pytest.mark.slow
def test_real_metrics_through_trainer_validation(tmp_path):
    """VERDICT r1 weak-8: FID+FVD (random weights) through Trainer.validation
    with a real BatchLoader, twice - exercising the real-activation caching
    path (eval/metrics.py FID._collect / FVD._collect) in situ."""
    from multi_stylegan_tpu.eval import FID, FVD

    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    cfg = TrainingConfig(batch_size=4, validate_every_n_epochs=100,
                         checkpoint_every_n_epochs=100)
    data = BatchLoader(
        SyntheticTLFMDataset(n_samples=8, resolution=(32, 32)),
        batch_size=4, seed=0, num_workers=1,
    )
    logger = Logger(experiment_path=str(tmp_path / "exp"))

    mk = dict(allow_random_weights=True, batch_size=4, data_samples=6,
              latent_dimensions=gcfg.latent_dimensions)
    fid, fvd = FID(**mk), FVD(**mk)
    collect_counts = {"fid": 0, "fvd": 0}
    for name, metric in (("fid", fid), ("fvd", fvd)):
        orig = metric._collect

        def counted(*a, _orig=orig, _name=name, **kw):
            collect_counts[_name] += 1
            return _orig(*a, **kw)

        metric._collect = counted

    trainer = Trainer(
        Generator(gcfg), Discriminator(dcfg), cfg,
        training_dataset=data, data_logger=logger,
        validation_metrics=(fid, fvd), epochs=1,
    )

    trainer.validation()
    # real + fake collection on the first run
    assert collect_counts == {"fid": 2, "fvd": 2}
    real_fid = fid.activations_real
    real_fvd = fvd.activations_real
    assert real_fid is not None and real_fvd is not None
    assert real_fid[0].shape == (6, 2048)  # pool-2048 features, data_samples
    assert set(real_fid) == {0, 1}  # per-domain (bf, gfp)

    # per-domain score tuples logged with finite values
    for key in ("FID_bf", "FID_gfp", "FVD_bf", "FVD_gfp"):
        assert key in logger.metrics, sorted(logger.metrics)
        assert np.isfinite(logger.metrics[key]).all()
    # best-FVD tracking uses the BF score (model_wrapper.py:238-243)
    assert trainer.best_fvd == logger.metrics["FVD_bf"][-1]

    trainer.validation()
    # second run: real activations cached - only the fake pass re-collects
    assert collect_counts == {"fid": 3, "fvd": 3}
    assert fid.activations_real is real_fid
    assert fvd.activations_real is real_fvd
    assert len(logger.metrics["FID_bf"]) == 2
