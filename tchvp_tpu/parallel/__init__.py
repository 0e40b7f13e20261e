"""Parallelism layer: mesh construction, shardings, multi-host helpers."""

from tchvp_tpu.parallel.mesh import (
    batch_spec,
    host_local_batch_slice,
    initialize_distributed,
    make_mesh,
    replicate,
    sequence_sharding,
    shard_batch,
)

__all__ = [
    "batch_spec",
    "host_local_batch_slice",
    "initialize_distributed",
    "make_mesh",
    "replicate",
    "sequence_sharding",
    "shard_batch",
]
