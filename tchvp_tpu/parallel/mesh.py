"""Device mesh + sharding helpers (build-new components ⊕A/⊕C).

The reference is single-`cuda:0` throughout (``FCT.py:276``, ``Model.py:17``,
recovered AE_32K L224) with no distributed backend. Here parallelism is
first-class and XLA-native: a named :class:`jax.sharding.Mesh`,
``NamedSharding`` on the clip batch (data parallel) and optionally on the
temporal token dim (sequence parallel), replicated params, and collectives
inserted by the compiler (grad psum rides ICI) — no hand-written NCCL/MPI.

Multi-host: `initialize_distributed` wraps ``jax.distributed.initialize``;
each host feeds its local shard of the global batch
(:func:`host_local_batch_slice`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (no-op on a single process)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named mesh over the available devices.

    Default: all devices on one "data" axis. Pass ``shape`` to factor the
    devices over multiple axes, e.g. ``axes=("data", "seq"), shape=(4, 2)``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


def batch_spec(mesh: Mesh, ndim: int, batch_axis: str = "data") -> P:
    """PartitionSpec sharding dim 0 over the batch axis, rest replicated."""
    return P(batch_axis, *([None] * (ndim - 1)))


def shard_batch(batch: Any, mesh: Mesh, batch_axis: str = "data") -> Any:
    """Place a (pytree of) host array(s) with dim-0 sharded over the mesh."""

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        return jax.device_put(
            x, NamedSharding(mesh, batch_spec(mesh, x.ndim, batch_axis))
        )

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sequence_sharding(mesh: Mesh, ndim: int, seq_dim: int = 1, axis: str = "seq") -> NamedSharding:
    """NamedSharding that splits a token sequence dim over ``axis`` —
    sequence parallelism for long clips (survey §5.7)."""
    spec = [None] * ndim
    spec[seq_dim] = axis
    return NamedSharding(mesh, P(*spec))


def host_local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of the global batch dim for
    multi-host input sharding (each host reads its own CSV shard)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return i * per, per
