"""Coverage for small utilities: image normalization, per-host batch
placement, step timer, schedule RNG, telemetry."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_stylegan_tpu.parallel import (
    batch_sharding,
    make_mesh,
    per_host_batch,
    shard_batch,
)
from multi_stylegan_tpu.utils import normalize_0_1_batch, normalize_m1_1_batch
from multi_stylegan_tpu.utils.profiling import StepTimer


def test_normalize_batch_helpers(rng):
    x = jnp.array(rng.uniform(2.0, 7.0, size=(3, 4, 5)).astype(np.float32))
    y = normalize_0_1_batch(x)
    assert float(y.max()) <= 1.0 + 1e-6
    assert float(y.min()) >= 1e-3 - 1e-6  # reference clamp quirk
    z = normalize_m1_1_batch(x)
    np.testing.assert_allclose(np.asarray(z), 2 * np.asarray(y) - 1, rtol=1e-6)


def test_per_host_batch_single_host(rng):
    mesh = make_mesh()
    batch = rng.normal(size=(8, 2, 3, 4, 4)).astype(np.float32)
    arr = per_host_batch(mesh, batch)
    assert arr.shape == batch.shape
    assert arr.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(arr), batch)


def test_per_host_batch_matches_shard_batch(rng):
    """The multi-host assembly path (make_array_from_process_local_data) is
    equivalent to plain device_put sharding: same sharding, same per-device
    shards, same result through a jitted sharded computation."""
    mesh = make_mesh()
    batch = rng.normal(size=(16, 2, 3, 4, 4)).astype(np.float32)
    a = per_host_batch(mesh, batch)
    b = shard_batch(mesh, jnp.asarray(batch))
    assert a.sharding == b.sharding
    for sa, sb in zip(a.addressable_shards, b.addressable_shards):
        assert sa.device == sb.device and sa.index == sb.index
        np.testing.assert_array_equal(np.asarray(sa.data), np.asarray(sb.data))
    f = jax.jit(lambda x: jnp.sum(x**2, axis=(1, 2, 3, 4)))
    np.testing.assert_allclose(np.asarray(f(a)), np.asarray(f(b)), rtol=1e-6)


def test_schedule_coin_deterministic():
    """The cut-mix schedule coin is a pure function of (seed, step): a
    resumed run replays the exact schedule with no host RNG checkpoint."""
    from multi_stylegan_tpu.train.loop import schedule_coin

    a = [schedule_coin(0, s) for s in range(200)]
    b = [schedule_coin(0, s) for s in range(200)]
    assert a == b
    assert all(0.0 <= v < 1.0 for v in a)
    assert len(set(a)) > 190  # distinct draws per step
    assert schedule_coin(1, 0) != schedule_coin(0, 0)  # seed matters
    # roughly uniform (200 draws, loose bound)
    assert 0.35 < float(np.mean(a)) < 0.65


def test_run_telemetry(tmp_path):
    from multi_stylegan_tpu.utils.telemetry import (
        RunTelemetry,
        _fmt_duration,
        process_title,
    )

    assert _fmt_duration(5) == "5s"
    assert _fmt_duration(65) == "1m05s"
    assert _fmt_duration(3700) == "1h01m"

    log = tmp_path / "eta.log"
    t = RunTelemetry("TestExp", max_iterations=4, log_path=str(log))
    t.start()
    old_title = process_title()
    eta = t.step()
    assert isinstance(eta, str) and eta
    lines = log.read_text().strip().splitlines()
    assert len(lines) == 1 and "epoch 1/4" in lines[0] and "eta=" in lines[0]
    t.step()
    assert "epoch 2/4" in log.read_text().strip().splitlines()[-1]
    # process title was renamed (Linux prctl comm, 15 chars)
    title = process_title()
    if title:  # /proc available
        assert title.startswith("TestExp"[:15][: len(title)]) or title != old_title


def test_step_timer():
    t = StepTimer()
    x = jnp.ones((64, 64))
    for _ in range(3):
        with t.measure(result_to_block_on=x @ x):
            pass
    s = t.summary()
    assert s["n"] == 3 and s["mean_ms"] >= 0.0
    assert t.last_ms == t.history[-1]
