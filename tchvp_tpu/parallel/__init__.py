"""Parallelism layer: mesh construction, shardings, multi-host helpers."""

from tchvp_tpu.parallel.fsdp import (
    constrain_gradients,
    fsdp_leaf_spec,
    shard_train_state,
    state_shardings,
)
from tchvp_tpu.parallel.input import GlobalBatchLoader, sharded_clippack_loader
from tchvp_tpu.parallel.pipeline import (
    chain_stage_fn,
    extract_transformer_layers,
    group_stages,
    pipeline_apply,
    pipelined_video_infer,
    shard_stages,
    stack_layer_params,
    transformer_layer_fn,
)
from tchvp_tpu.parallel.plan import (
    LeafPlan,
    ShardingPlan,
    abstract_train_state,
    plan_state,
)
from tchvp_tpu.parallel.mesh import (
    activate_mesh,
    ambient_mesh,
    batch_spec,
    host_local_batch_slice,
    initialize_distributed,
    make_hybrid_mesh,
    make_mesh,
    mesh_with_axis,
    replicate,
    sequence_sharding,
    shard_batch,
)

__all__ = [
    "GlobalBatchLoader",
    "LeafPlan",
    "ShardingPlan",
    "abstract_train_state",
    "plan_state",
    "sharded_clippack_loader",
    "activate_mesh",
    "ambient_mesh",
    "batch_spec",
    "constrain_gradients",
    "fsdp_leaf_spec",
    "shard_train_state",
    "state_shardings",
    "chain_stage_fn",
    "extract_transformer_layers",
    "group_stages",
    "pipeline_apply",
    "pipelined_video_infer",
    "shard_stages",
    "stack_layer_params",
    "transformer_layer_fn",
    "host_local_batch_slice",
    "initialize_distributed",
    "make_hybrid_mesh",
    "make_mesh",
    "mesh_with_axis",
    "replicate",
    "sequence_sharding",
    "shard_batch",
]
