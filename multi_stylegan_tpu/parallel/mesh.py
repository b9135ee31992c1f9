"""Device mesh + sharding rules - distribution as a real layer.

The reference bolts data parallelism on at the CLI with single-process
``nn.DataParallel`` (reference train_multi_stylegan.py:67-70) and unwraps it
all over the runtime (SURVEY.md §1, §2.5).  Here distribution is explicit and
invisible to the layers above: build a mesh, shard the batch on the ``data``
axis, replicate parameters, and jit the fused train step - the XLA SPMD
partitioner inserts the gradient all-reduces over ICI.

The mesh reserves a ``model`` axis for tensor-parallel extensions; the
shipped models fit one chip, so the default layout is pure DP
(data=n_devices, model=1).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    mesh_devices = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[: n_data * n_model]
    )
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: jax.Array) -> jax.Array:
    """Place a host array as a batch-sharded device array."""
    return jax.device_put(batch, batch_sharding(mesh))


def state_shardings(mesh: Mesh, state):
    """NamedSharding pytree for a TrainState under DP(+TP).

    With a trivial ``model`` axis (size 1) everything replicates — pure
    data parallelism, the reference's regime (nn.DataParallel,
    train_multi_stylegan.py:67-70).  With ``n_model > 1`` the framework
    goes beyond the reference: every 4-D conv kernel whose output-channel
    dim divides the model axis shards over MODEL_AXIS (column-parallel;
    NHWC/HWIO keeps channels on the minor dim, so the shard rides the
    128-wide lanes).  Adam moments and EMA mirrors inherit the same rule
    by shape, so the whole optimizer state is TP-sharded with zero extra
    bookkeeping; XLA GSPMD inserts the activation collectives.  (Pipeline
    /sequence/expert axes are N/A for this architecture: 3 frames fold
    into channels and there is no MoE — SURVEY.md §5.)
    """
    rep = NamedSharding(mesh, P())
    n_model = mesh.shape[MODEL_AXIS]
    if n_model == 1:
        return jax.tree.map(lambda _: rep, state)
    tp = NamedSharding(mesh, P(None, None, None, MODEL_AXIS))

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 4 and shape[3] % n_model == 0 and shape[3] >= n_model:
            return tp
        return rep

    return jax.tree.map(rule, state)


def shard_state(mesh: Mesh, state, shardings=None):
    """Place a host-side state pytree according to ``shardings``
    (default: :func:`state_shardings`).  Multi-process-safe: each process
    fills only its addressable shards (see :func:`replicate_state`)."""
    if shardings is None:
        shardings = state_shardings(mesh, state)
    if jax.process_count() == 1:
        return jax.device_put(state, shardings)

    def put(x, sharding):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                         jax.dtypes.prng_key):
            data = put(jax.random.key_data(x), sharding)
            return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
        host = np.asarray(x)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx])

    return jax.tree.map(put, state, shardings)


def replicate_state(mesh: Mesh, state):
    """Replicate a pytree (params / train state) across the mesh.

    Multi-process (TPU pod / multi-host CPU): ``jax.device_put`` rejects
    committed single-process arrays targeted at a sharding that spans
    non-addressable devices, so :func:`shard_state` fills each process's
    addressable replicas via ``make_array_from_callback`` (with typed
    PRNG-key handling) — the leaves are deterministic replicas of the same
    values on every process (create_train_state is seeded), which is
    exactly the replicated-sharding contract.  Exercised for real at
    process_count=2 by tests/test_multihost.py.
    """
    rep = replicated(mesh)
    return shard_state(mesh, state, jax.tree.map(lambda _: rep, state))


def per_host_batch(mesh: Mesh, local_batch: np.ndarray) -> jax.Array:
    """Assemble a globally batch-sharded array from per-host local data
    (multi-host input pipelines, SURVEY.md §2.5): each process contributes
    its shard of the global batch.  ``make_array_from_process_local_data``
    handles the single-host case too (local data == global batch), where the
    result equals :func:`shard_batch` — asserted by tests/test_utils.py."""
    sharding = batch_sharding(mesh)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))


def process_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align all controller processes via the coordination service.

    Gloo (the CPU-backend collective transport) gives each new communicator
    context only ~30 s of key-value rendezvous: if controllers reach their
    FIRST collective more than 30 s apart (compile-time variance is enough),
    context init fails with DEADLINE_EXCEEDED.  The coordination-service
    barrier has a long explicit timeout and no Gloo dependency, so calling
    it right before a collective-using phase (orbax directory sync, first
    sharded step) collapses the skew to milliseconds.  No-op single-process
    and on runtimes without a distributed client.
    """
    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed

        client = distributed.global_state.client
    except Exception:  # pragma: no cover - internal API moved
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def warmup_collectives(mesh: Mesh) -> None:
    """Establish the full-mesh Gloo communicator while controllers are
    still aligned.

    XLA caches one communicator per device clique; the rendezvous for a NEW
    clique tolerates only ~30 s of cross-process skew (see
    :func:`process_barrier`).  Without warm-up, the first full-mesh
    collective fires after the train-step compile — whose multi-minute
    duration varies enough between processes to blow that window.  A
    barrier followed by one tiny all-reduce pins the clique early; later
    programs reuse the cached communicator.  No-op single-process.
    """
    if jax.process_count() == 1:
        return
    process_barrier("warmup_collectives")
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    n = mesh.devices.size
    x = jax.make_array_from_callback(
        (n,), sharding, lambda idx: np.ones((len(range(*idx[0].indices(n))),),
                                            np.float32))
    total = jax.jit(lambda v: v.sum(),
                    out_shardings=NamedSharding(mesh, P()))(x)
    assert float(total) == float(n)


def make_sharded_train_step(train_step, mesh: Mesh, donate: bool = True,
                            state_sharding=None):
    """jit the fused train step with explicit shardings: batch sharded over
    the data axis, state replicated (pure DP, default) or sharded per a
    :func:`state_shardings` tree (DP x TP over the ``model`` axis).
    Gradient all-reduce / TP activation collectives compile to XLA
    collectives over ICI (SURVEY.md §2.5)."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    ssh = rep if state_sharding is None else state_sharding
    return jax.jit(
        train_step,
        in_shardings=(ssh, bsh, rep),
        out_shardings=(ssh, rep),
        donate_argnums=(0,) if donate else (),
    )
