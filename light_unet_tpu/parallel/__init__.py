from light_unet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    mesh_from_config,
    replicate,
    replicated_sharding,
    shard_batch,
)
