"""Distribution layer: device mesh, sharding rules, sharded train step."""

from multi_stylegan_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    per_host_batch,
    process_barrier,
    replicate_state,
    replicated,
    shard_batch,
    shard_state,
    state_shardings,
    warmup_collectives,
)
