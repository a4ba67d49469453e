"""Device mesh and sharding utilities for SPMD training."""

from viscy_tpu.parallel.mesh import (
    get_mesh,
    make_mesh,
    replicate,
    shard_batch,
    local_batch_slice,
)
from viscy_tpu.parallel.pipeline import (
    gpipe_apply,
    gpipe_spec,
    pipeline_vit_blocks,
    stack_stage_params,
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
    "gpipe_apply",
    "gpipe_spec",
    "stack_stage_params",
    "pipeline_vit_blocks",
]
