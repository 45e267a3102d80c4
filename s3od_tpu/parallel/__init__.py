from s3od_tpu.parallel.distributed import (
    global_batch_sharding,
    init_distributed,
    make_hybrid_mesh,
    process_local_batch,
)
from s3od_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "init_distributed",
    "param_shardings",
    "batch_sharding",
    "global_batch_sharding",
    "process_local_batch",
    "shard_params",
    "shard_batch",
]
