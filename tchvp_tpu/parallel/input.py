"""Multi-host sharded input pipelines (build-new component ⊕C/⊕D glue).

Each host reads only its shard of every global batch (the ClipPack loader
slices a shared epoch permutation, so shards concatenate to exactly the
single-host batch), then the local arrays are assembled into one global
``jax.Array`` laid out over the mesh — the standard multi-host JAX input
pattern (per-host data feeding, no cross-host copies).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class GlobalBatchLoader:
    """Wrap a per-host batch iterable into global mesh-sharded jax.Arrays.

    ``local_loader`` yields this host's (local_batch, ...) numpy arrays;
    iteration yields global arrays with dim 0 = local_batch *
    process_count, sharded over ``axis``.
    """

    def __init__(self, local_loader: Iterable, mesh: Mesh, axis: str = "data"):
        self.local_loader = local_loader
        self.mesh = mesh
        self.axis = axis

    def __len__(self) -> int:
        return len(self.local_loader)  # type: ignore[arg-type]

    def _sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(
            self.mesh, P(self.axis, *([None] * (ndim - 1)))
        )

    def __iter__(self) -> Iterator[jax.Array]:
        for local in self.local_loader:
            local = np.asarray(local)
            yield jax.make_array_from_process_local_data(
                self._sharding(local.ndim), local
            )


def sharded_clippack_loader(
    path: str,
    global_batch: int,
    mesh: Mesh,
    axis: str = "data",
    shuffle: bool = True,
    seed: int = 0,
    num_threads: int = 4,
    prefer_native: bool = True,
) -> GlobalBatchLoader:
    """ClipPack -> per-host native loader -> global sharded batches.

    ``global_batch`` splits evenly over hosts; every host shares the epoch
    permutation (same seed) and assembles only its slice.
    """
    from tchvp_tpu.data.clippack import ClipPackDataset

    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(f"global batch {global_batch} not divisible by {n_proc} hosts")
    ds = ClipPackDataset(
        path,
        batch_size=global_batch // n_proc,
        shuffle=shuffle,
        seed=seed,
        num_threads=num_threads,
        prefer_native=prefer_native,
        shard_id=jax.process_index(),
        num_shards=n_proc,
    )
    return GlobalBatchLoader(ds, mesh, axis)
