"""Device mesh and sharding utilities for SPMD training."""

from viscy_tpu.parallel.mesh import (
    get_mesh,
    make_mesh,
    replicate,
    shard_batch,
    local_batch_slice,
)
from viscy_tpu.parallel.sharding_rules import infer_param_sharding, shard_train_state

__all__ = [
    "make_mesh",
    "get_mesh",
    "shard_batch",
    "replicate",
    "local_batch_slice",
    "infer_param_sharding",
    "shard_train_state",
]
