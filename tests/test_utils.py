"""Coverage for small utilities: image normalization, per-host batch
placement, step timer."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_stylegan_tpu.parallel import batch_sharding, make_mesh, per_host_batch
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


def test_step_timer():
    t = StepTimer()
    x = jnp.ones((64, 64))
    for _ in range(3):
        with t.measure(result_to_block_on=x @ x):
            pass
    s = t.summary()
    assert s["n"] == 3 and s["mean_ms"] >= 0.0
    assert t.last_ms == t.history[-1]
