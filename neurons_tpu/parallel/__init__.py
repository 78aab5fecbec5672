from neurons_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    local_mesh_size,
    prefetch_to_device,
    replicate,
    fsdp_sharding,
    shard_opt_state,
    shard_opt_state_like,
    opt_sharding_fn,
)
