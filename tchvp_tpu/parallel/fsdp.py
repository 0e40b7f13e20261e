"""FSDP / ZeRO-3 parameter + optimizer-state sharding (build-new ⊕C axis).

The reference trains on a single ``cuda:0`` with fully replicated
parameters (``FCT.py:276``, ``Model.py:17``, recovered AE_32K L224) — its
per-device memory for a model of P params is P (weights) + 2P (Adam
moments) + P (grads) regardless of device count. The TPU-native design
stores all four SHARDED over the data axis, ZeRO-3 style:

* every large parameter leaf (and its Adam ``mu``/``nu`` moments, which
  share its shape) is split over the mesh's data axis along its largest
  divisible dimension — per-device state memory drops by ~the axis size;
* XLA/GSPMD inserts ``all-gather`` on each parameter right before its
  (conv/matmul) use in the forward/backward and discards the gathered
  copy after — exactly FSDP's gather-on-use, no hand-written bucketing;
* the gradient tree is constrained to the SAME shardings before the
  optimizer update (:func:`constrain_gradients`), so GSPMD lowers the
  data-parallel gradient reduction to ``reduce-scatter`` (each device
  reduces only its own shard) instead of a full ``all-reduce`` — ZeRO's
  bandwidth saving — and the Adam update itself runs on 1/axis-size of
  each leaf per device.

All collectives ride ICI via the compiler; there is no shard_map here by
design — parameter sharding is pure data placement + one constraint, the
case GSPMD handles optimally (contrast ``ops/attention.py``'s halo
exchange, where the hand-written ppermute beats the GSPMD gather).

Composes with every other axis in the repo: the batch stays sharded over
the same "data" axis (classic dp semantics are unchanged — FSDP only
changes WHERE state lives between steps), and seq/tensor/expert/pipeline
sharding of activations is orthogonal.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Union

import jax
import numpy as np
from jax.sharding import AbstractMesh, Mesh, NamedSharding, PartitionSpec as P

from tchvp_tpu.ops import dispatch_trace
from tchvp_tpu.parallel.mesh import mesh_with_axis

# Leaves smaller than this stay replicated: sharding a 512-float BN
# vector saves nothing and costs a gather. 16 KiB fp32 = 4096 elements.
MIN_SHARD_ELEMS = 4096


def fsdp_leaf_spec(
    shape: tuple, axis: str, axis_size: int, min_elems: int = MIN_SHARD_ELEMS
) -> P:
    """PartitionSpec sharding one dim of ``shape`` over ``axis``.

    Picks the LARGEST dimension divisible by ``axis_size`` (evenness
    beats convention here: conv kernels are (kh, kw, cin, cout) with
    tiny leading dims, Dense kernels (cin, cout) — the fan dims are
    where the bytes are). Small or indivisible leaves replicate.
    """
    if axis_size <= 1 or math.prod(shape) < min_elems:
        return P()
    best_dim, best_size = -1, 0
    for d, s in enumerate(shape):
        if s % axis_size == 0 and s > best_size:
            best_dim, best_size = d, s
    if best_dim < 0:
        return P()
    spec: list = [None] * len(shape)
    spec[best_dim] = axis
    return P(*spec)


def _leaf_shape(x: Any) -> Optional[tuple]:
    shape = getattr(x, "shape", None)
    if shape is None:
        return None
    return tuple(shape)


def state_shardings(
    tree: Any, mesh: Mesh, axis: str = "data", min_elems: int = MIN_SHARD_ELEMS
) -> Any:
    """Pytree of NamedShardings for a TrainState (or any array pytree).

    Per-leaf by shape, so Adam ``mu``/``nu`` (same shapes as params)
    shard identically to their parameters, while optimizer scalars,
    PRNG keys, BN stats, and step counters replicate.
    """
    axis_size = mesh.shape[axis]

    def one(x):
        shape = _leaf_shape(x)
        if shape is None:
            return NamedSharding(mesh, P())
        return NamedSharding(
            mesh, fsdp_leaf_spec(shape, axis, axis_size, min_elems)
        )

    return jax.tree.map(one, tree)


def shard_train_state(
    state: Any, mesh: Mesh, axis: str = "data", min_elems: int = MIN_SHARD_ELEMS
) -> Any:
    """Place a TrainState with params/moments sharded over ``axis``.

    The FSDP counterpart of :func:`tchvp_tpu.parallel.mesh.replicate`:
    call it once after ``create_train_state`` (and after every restore)
    and pass ``fsdp_axis`` to the step factory so gradients are
    reduce-scattered instead of all-reduced.
    """
    return jax.device_put(state, state_shardings(state, mesh, axis, min_elems))


def constrain_gradients(
    grads: Any,
    axis: str,
    mesh: Optional[Union[Mesh, AbstractMesh]] = None,
    min_elems: int = MIN_SHARD_ELEMS,
) -> Any:
    """Constrain a gradient tree to the FSDP shardings of its params.

    Called inside the jitted train step (trace time). The mesh comes
    either from the explicit ``mesh`` argument (flows pass their own —
    no ambient scope needed at step-call time) or from the ambient scope
    via either API (``parallel/mesh.py::ambient_mesh``); if neither is
    available, or the axis is absent/size-1, this is the identity — the
    step factory's ``fsdp_axis`` knob is then dormant, exactly like the
    seq/tp gates. Records the ``fsdp_constrain`` dispatch marker so
    tests and ``dryrun_multichip`` FAIL if the path silently falls back
    (the round-2 lesson: gates must be attestable).
    """
    if mesh is None:
        mesh = mesh_with_axis(axis)  # the shared seq/ep/fsdp gate
        if mesh is None:
            return grads
    elif axis not in mesh.axis_names or mesh.shape[axis] <= 1:
        return grads
    axis_size = mesh.shape[axis]

    def one(g):
        shape = _leaf_shape(g)
        if shape is None:
            return g
        spec = fsdp_leaf_spec(shape, axis, axis_size, min_elems)
        return jax.lax.with_sharding_constraint(g, _as_sharding(mesh, spec))

    dispatch_trace.record("fsdp_constrain")
    return jax.tree.map(one, grads)


def _as_sharding(
    mesh: Union[Mesh, AbstractMesh], spec: P
) -> Union[NamedSharding, P]:
    """A concrete mesh wants NamedSharding; under ``set_mesh`` the
    abstract mesh accepts (indeed requires) the raw PartitionSpec."""
    if isinstance(mesh, Mesh):
        return NamedSharding(mesh, spec)
    return spec


def sharded_size_bytes(tree: Any) -> int:
    """Per-device (addressable-shard) bytes of an array pytree — the
    number FSDP shrinks; tests assert ~1/axis_size of the global size."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        if not isinstance(leaf, jax.Array):
            continue
        shards = leaf.addressable_shards
        if not shards:
            continue
        s = shards[0]
        total += int(np.prod(s.data.shape)) * leaf.dtype.itemsize
    return total


def global_size_bytes(tree: Any) -> int:
    total = 0
    for leaf in jax.tree.leaves(tree):
        shape = _leaf_shape(leaf)
        if shape is None:
            continue
        itemsize = getattr(getattr(leaf, "dtype", None), "itemsize", 4)
        total += int(math.prod(shape)) * itemsize
    return total
