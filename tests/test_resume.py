"""Checkpoint/resume integration: a restored Trainer continues from the
exact step with the full schedule state (the reference loses ADA p/r and the
epoch counter on resume - SURVEY.md §5)."""

import jax
import jax.numpy as jnp
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
def test_trainer_resume_continues_from_checkpoint(tmp_path):
    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    cfg = TrainingConfig(batch_size=4, checkpoint_every_n_epochs=1,
                         validate_every_n_epochs=100, ada_r_update=2)
    data = BatchLoader(SyntheticTLFMDataset(n_samples=8, resolution=(32, 32)),
                       batch_size=4, num_workers=1)

    t1 = Trainer(Generator(gcfg), Discriminator(dcfg), cfg,
                 training_dataset=data,
                 data_logger=Logger(experiment_path=str(tmp_path / "e1")),
                 checkpoint_dir=str(tmp_path / "ckpt"), epochs=1)
    state1 = t1.train()
    step1 = int(jax.device_get(state1.step))
    ada_p1 = float(jax.device_get(state1.ada.p))
    mpl1 = float(jax.device_get(state1.mean_path_length))
    t1.ckpt.close()
    assert step1 == 2

    # fresh Trainer restores everything: step counter, ADA state, EMA,
    # optimizer moments, path-length mean
    t2 = Trainer(Generator(gcfg), Discriminator(dcfg), cfg,
                 training_dataset=data,
                 data_logger=Logger(experiment_path=str(tmp_path / "e2")),
                 checkpoint_dir=str(tmp_path / "ckpt"), epochs=1)
    assert t2.restore_latest()
    assert int(jax.device_get(t2.state.step)) == step1
    np.testing.assert_allclose(float(jax.device_get(t2.state.ada.p)), ada_p1)
    np.testing.assert_allclose(
        float(jax.device_get(t2.state.mean_path_length)), mpl1)
    a = jax.tree.leaves(state1.g_ema_params)[0]
    b = jax.tree.leaves(t2.state.g_ema_params)[0]
    np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                  np.asarray(jax.device_get(b)))

    state2 = t2.train()
    assert int(jax.device_get(state2.step)) == step1 + 2
    t2.ckpt.close()


def test_restore_latest_uses_abstract_template(tmp_path, monkeypatch):
    """Trainer.restore_latest must hand CheckpointManager an ABSTRACT
    template and drop its live state first: restoring over live arrays
    materializes a second full TrainState, which OOMs the chip at the
    flagship config (VERDICT round-2 item 7)."""
    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    cfg = TrainingConfig(batch_size=4)
    data = BatchLoader(SyntheticTLFMDataset(n_samples=8, resolution=(32, 32)),
                       batch_size=4, num_workers=1)
    t = Trainer(Generator(gcfg), Discriminator(dcfg), cfg,
                training_dataset=data,
                data_logger=Logger(experiment_path=str(tmp_path / "exp")),
                checkpoint_dir=str(tmp_path / "ckpt"), epochs=1)
    t.ckpt.save(0, t.state)

    seen = {}
    real_restore = type(t.ckpt).restore

    def spying_restore(self, template, step=None):
        seen["all_abstract"] = all(
            isinstance(leaf, jax.ShapeDtypeStruct)
            for leaf in jax.tree.leaves(template)
        )
        seen["live_state_dropped"] = t.state is None
        return real_restore(self, template, step)

    monkeypatch.setattr(type(t.ckpt), "restore", spying_restore)
    assert t.restore_latest()
    assert seen["all_abstract"], "template must be ShapeDtypeStructs"
    assert seen["live_state_dropped"], "live state must be dropped pre-restore"
    assert int(jax.device_get(t.state.step)) == 0
    t.ckpt.close()


def test_resume_training_flag_regimes():
    """--resume_training forces the late-training regimes immediately
    (model_wrapper.py:121-123, 272, 290-291, 331-332)."""
    gcfg = tiny_generator_config()
    dcfg = tiny_discriminator_config()
    data = BatchLoader(SyntheticTLFMDataset(n_samples=8, resolution=(32, 32)),
                       batch_size=4, num_workers=1)
    cfg = TrainingConfig(batch_size=4, resume_training=True)
    t = Trainer(Generator(gcfg), Discriminator(dcfg), cfg,
                training_dataset=data, epochs=10,
                data_logger=Logger(experiment_path="/tmp/resume_flag_exp"))
    wrong, trap, cm = t._epoch_flags(epoch=0)
    assert wrong and trap and cm == 0.5
    # without the flag, epoch 0 has everything off and the cut-mix ramp at 0
    cfg2 = TrainingConfig(batch_size=4, resume_training=False)
    t2 = Trainer(Generator(gcfg), Discriminator(dcfg), cfg2,
                 training_dataset=data, epochs=10,
                 data_logger=Logger(experiment_path="/tmp/resume_flag_exp2"))
    wrong, trap, cm = t2._epoch_flags(epoch=0)
    assert not wrong and not trap and cm == 0.0
    # late epochs turn the regimes on (fractions of total epochs)
    wrong, trap, cm = t2._epoch_flags(epoch=9)
    assert wrong and trap and cm == pytest.approx(0.45)
