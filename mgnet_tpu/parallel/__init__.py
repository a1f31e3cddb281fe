from mgnet_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    replicate_to_mesh,
    replicated_sharding,
    shard_batch,
)
from mgnet_tpu.parallel.multihost import (
    all_gather_host,
    initialize_distributed,
    is_main_process,
    synchronize,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "create_mesh",
    "batch_sharding",
    "replicate_to_mesh",
    "replicated_sharding",
    "shard_batch",
    "initialize_distributed",
    "is_main_process",
    "synchronize",
    "all_gather_host",
]
