from objcavit_tpu.parallel.distributed import (
    initialize_distributed,
    is_main_process,
    process_local_indices,
    resolve_distributed_args,
    shard_host_local_batch,
)
from objcavit_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from objcavit_tpu.parallel.tp import (
    count_tp_sharded,
    tp_shard_params,
    tp_spec_for,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "tp_shard_params",
    "tp_spec_for",
    "count_tp_sharded",
    "initialize_distributed",
    "is_main_process",
    "process_local_indices",
    "resolve_distributed_args",
    "shard_host_local_batch",
]
