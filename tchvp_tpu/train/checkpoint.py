"""Checkpoint / resume / transfer (survey §5.4).

Capability-equivalent to the reference's two ``torch.save`` formats:
* full training-state dict ``{epoch, model, optimizer, loss}``
  (``FCT.py:368-373``, recovered AE_32K L301-306) -> :func:`save_state` /
  :func:`restore_state`;
* weights-only state_dict (``Model.py:182,186``) -> :func:`save_params` /
  :func:`restore_params`;
plus the transfer interface: partial (subtree) restore so a pretrained
encoder can seed a new model whose decoder trains from scratch
(AE_32K L233-245), combined with ``make_optimizer(frozen_prefixes=...)``.

Backed by orbax (step-tagged directories, atomic writes).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def is_sharded_state(tree: Any) -> bool:
    """True when any leaf is a jax.Array actually partitioned across
    devices (a ZeRO-3/FSDP-placed state from
    :func:`tchvp_tpu.parallel.fsdp.shard_train_state`, or any other
    non-replicated placement — Positional/GSPMD shardings included, so
    gather-avoidance does not depend on HOW the state was sharded).
    Replicated or unplaced single-device states return False — for those
    the host-numpy checkpoint path is equivalent and cheaper."""
    for leaf in jax.tree.leaves(tree):
        if (
            isinstance(leaf, jax.Array)
            and not leaf.sharding.is_fully_replicated
        ):
            return True
    return False


def _ckpt_structure(path: str, ckpt: ocp.PyTreeCheckpointer) -> Any:
    """The on-disk pytree (metadata leaves), without reading array data."""
    meta = ckpt.metadata(path).item_metadata
    return meta.tree if hasattr(meta, "tree") else dict(meta)


# One process-wide AsyncCheckpointer: orbax serializes its own queue, and
# sharing it lets wait_for_async_saves() drain everything in flight.
_ASYNC: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def wait_for_async_saves() -> None:
    """Block until every async :func:`save_state` has committed to disk.

    Call before process exit and before reading a just-written step dir.
    The restore/discovery helpers here call it themselves.
    """
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_state(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    batch_stats: Any = None,
    extra: Optional[Dict[str, Any]] = None,
    async_write: bool = False,
    sharded: Optional[bool] = None,
) -> str:
    """Save a full training state under ``directory/step_{step}``.

    ``async_write=True`` (survey §5.4, build-new): the device->host copy
    happens now (cheap), but the disk write runs on orbax's background
    thread so the train loop overlaps IO with the next steps — the knob
    that matters when checkpoints are hundreds of MB and steps are ms.
    The write is atomic (orbax tmp-dir rename) and
    :func:`wait_for_async_saves` / any restore helper joins it.

    ``sharded`` (default: auto-detect via :func:`is_sharded_state`):
    a ZeRO-3/FSDP-placed state is saved SHARD-WISE — jax.Array leaves go
    to orbax as-is, each host writes only its addressable shards, and no
    full copy of any leaf is ever materialized (gathering a state that
    is sharded *because it does not fit* would defeat ZeRO-3; on
    multi-host it would also crash on non-addressable arrays). Restore
    with :func:`restore_state_into` on a placed live state (sharded
    template reads, including onto a different mesh size — elastic
    resume) or with :func:`restore_state`/:func:`restore_params`
    (host-numpy fallback for single-device consumers like eval/export).
    """
    if sharded is None:
        sharded = is_sharded_state((params, opt_state))
    host = (lambda t: t) if sharded else _to_host
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    payload = {"params": host(params), "step": step}
    if opt_state is not None:
        payload["opt_state"] = host(opt_state)
    if batch_stats is not None:
        payload["batch_stats"] = host(batch_stats)
    if extra:
        payload["extra"] = host(extra)
    if async_write:
        _async_checkpointer().save(path, payload, force=True)
    else:
        ocp.PyTreeCheckpointer().save(path, payload, force=True)
    return path


def restore_state(path: str, template: Optional[Any] = None) -> Dict[str, Any]:
    """Restore a full training state saved by :func:`save_state`.

    Handles both on-disk formats: host-numpy checkpoints read directly;
    shard-wise checkpoints (``save_state(sharded=True)``) carry sharding
    metadata orbax refuses to restore untemplated, so those fall back to
    a metadata-driven numpy read (every leaf forced to ``np.ndarray`` —
    fine for single-host consumers; for a no-gather restore of a big
    state use :func:`restore_state_into` on a placed live state)."""
    wait_for_async_saves()  # a just-queued async save must be readable
    ckpt = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckpt.restore(path, item=template)
    try:
        return ckpt.restore(path)
    except ValueError:
        return _restore_host_forced(path, ckpt)


def _restore_host_forced(path: str, ckpt: ocp.PyTreeCheckpointer) -> Any:
    """Numpy-forced read of a shard-wise checkpoint (its array entries
    have sharding metadata whose devices need not exist here)."""
    disk = _ckpt_structure(path, ckpt)
    rargs = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), disk
    )
    return ckpt.restore(path, restore_args=rargs)


def restore_state_into(state, path: str, sharded: Optional[bool] = None):
    """Restore params / opt_state / batch_stats from ``path`` into a live
    TrainState, preserving optimizer pytree structure (orbax without a
    template flattens optax namedtuples to dicts — restoring those into
    ``state.opt_state`` would corrupt the optimizer). Restoring opt_state
    matters after a divergence recovery: Adam's m/v moments from the good
    step come back instead of NaN-poisoned or freshly-zeroed ones.

    Returns ``(state, raw)`` where ``raw`` is the untemplated payload
    (for ``step`` / ``extra`` — e.g. the reference's full loss-history
    list, ``FCT.py:368-373``).

    One disk read: the untemplated restore loses pytree node types —
    optax namedtuples come back as dicts keyed by FIELD NAME, plain
    tuples as lists — so the live state re-types them recursively,
    matching namedtuple fields by name. (Round 2 paired flat
    ``jax.tree.leaves`` of the payload — sorted-key order — with the
    live treedef — field-declaration order; any namedtuple with
    non-alphabetical fields, e.g. optax ``ApplyIfFiniteState`` from
    ``make_optimizer(skip_nonfinite_updates=N)``, would silently permute
    optimizer leaves. Advisor finding, round 2.)

    ``sharded`` (default: auto via :func:`is_sharded_state` on the live
    state): a ZeRO-3/FSDP-placed state restores through orbax's sharded
    template reads — each leaf comes back AS the live leaf's
    NamedSharding with no host gather and no replicated copy (the live
    state's shardings are the template, so restoring onto a different
    mesh size reshards on the fly — elastic resume). Works on both
    on-disk formats; replicated/unplaced states keep the host-numpy
    path below.
    """
    if sharded is None:
        sharded = is_sharded_state(state)
    if sharded:
        return _restore_state_sharded(state, path)
    raw = restore_state(path)
    state = state.replace(params=_retype(state.params, raw["params"]))
    if "opt_state" in raw and state.opt_state is not None:
        state = state.replace(opt_state=_retype(state.opt_state, raw["opt_state"]))
    if "batch_stats" in raw and state.batch_stats is not None:
        state = state.replace(
            batch_stats=_retype(state.batch_stats, raw["batch_stats"])
        )
    return state, raw


def _restore_state_sharded(state, path: str):
    """Template restore of params/opt_state/batch_stats into the live
    state's placements: orbax reads each shard straight into its target
    device (``ArrayRestoreArgs`` per leaf), so peak memory is the SHARDED
    state size — the restore counterpart of ``save_state(sharded=True)``.
    Pytree node types (optax namedtuples) ride the template, so no
    ``_retype`` pass is needed. Non-array checkpoint keys (``step``,
    ``extra``) restore as host values; returns ``(state, raw)`` like
    :func:`restore_state_into`."""
    wait_for_async_saves()
    ckpt = ocp.PyTreeCheckpointer()
    disk = _ckpt_structure(path, ckpt)
    live: Dict[str, Any] = {"params": state.params}
    if "opt_state" in disk and state.opt_state is not None:
        live["opt_state"] = state.opt_state
    if "batch_stats" in disk and getattr(state, "batch_stats", None) is not None:
        live["batch_stats"] = state.batch_stats
    item = dict(live)
    restore_args = ocp.checkpoint_utils.construct_restore_args(live)
    for key, sub in disk.items():  # step/extra: host-side defaults
        if key in item:
            continue
        item[key] = jax.tree.map(lambda _: 0, sub)
        restore_args[key] = jax.tree.map(lambda _: ocp.RestoreArgs(), sub)
    out = ckpt.restore(path, item=item, restore_args=restore_args)
    state = state.replace(params=out["params"])
    if "opt_state" in live:
        state = state.replace(opt_state=out["opt_state"])
    if "batch_stats" in live:
        state = state.replace(batch_stats=out["batch_stats"])
    raw = {k: out[k] for k in out if k not in live}
    return state, raw


def _retype(target, payload):
    """Rebuild ``payload`` (an untemplated orbax restore) with ``target``'s
    pytree node types, matching namedtuple fields by NAME and sequence
    elements positionally. Leaf shape/dtype mismatches raise."""
    fields = getattr(target, "_fields", None)
    if fields is not None:  # namedtuple (optax states)
        if payload is None and not fields:  # e.g. optax.EmptyState
            return type(target)()
        if not isinstance(payload, dict):
            raise ValueError(
                f"expected name-keyed dict for {type(target).__name__}, "
                f"got {type(payload).__name__}"
            )
        return type(target)(
            **{f: _retype(getattr(target, f), payload[f]) for f in fields}
        )
    if isinstance(target, dict):
        if not isinstance(payload, dict):
            raise ValueError(
                f"expected dict payload, got {type(payload).__name__}"
            )
        extra = set(payload) - set(target)
        if extra:  # a silent drop would mask a partial/mismatched restore
            raise ValueError(
                f"checkpoint has keys absent from the live state: "
                f"{sorted(extra)} (live keys: {sorted(target)})"
            )
        return type(target)(
            (k, _retype(v, payload[k])) for k, v in target.items()
        )
    if isinstance(target, (list, tuple)):
        if not isinstance(payload, (list, tuple)) or len(payload) != len(target):
            raise ValueError(
                f"sequence length mismatch: live {len(target)} vs "
                f"checkpoint {len(payload) if isinstance(payload, (list, tuple)) else type(payload).__name__}"
            )
        return type(target)(_retype(t, p) for t, p in zip(target, payload))
    # Leaf: sanity-check against the live state before adopting.
    t_shape = getattr(target, "shape", None)
    p_shape = getattr(payload, "shape", None)
    if t_shape is not None and p_shape is not None and tuple(t_shape) != tuple(p_shape):
        raise ValueError(
            f"checkpoint leaf shape {tuple(p_shape)} != live {tuple(t_shape)}"
        )
    return payload


def save_params(directory: str, name: str, params: Any) -> str:
    """Weights-only save (the Model.py:182 best-checkpoint pattern)."""
    path = os.path.join(os.path.abspath(directory), name)
    ocp.PyTreeCheckpointer().save(path, _to_host(params), force=True)
    return path


def restore_params(path: str) -> Any:
    ckpt = ocp.PyTreeCheckpointer()
    try:
        return ckpt.restore(path)
    except ValueError:  # shard-wise format: numpy-forced fallback
        return _restore_host_forced(path, ckpt)


def restore_subtree(path: str, keys: Sequence[str]) -> Dict[str, Any]:
    """Partial restore: load only the named top-level param subtrees
    (e.g. ``("encoder",)``) — the AE_32K L233-236 encoder-transfer load."""
    full = restore_params(path)
    params = full.get("params", full)
    return {k: params[k] for k in keys}


def prune_step_dirs(directory: str, keep_last: int) -> int:
    """Delete all but the newest ``keep_last`` ``step_*`` checkpoints.

    Disk-budget rotation (build-new; the reference accumulates ``.tar``
    files forever — FCT.py:368, AE_32K L301). Does NOT join in-flight
    async saves (that would make every post-save prune re-serialize the
    train loop, negating ``async_write=True``): an in-flight save lives
    in an orbax tmp dir whose name fails the ``step_<digits>`` filter
    below, so it can be neither listed nor doomed, and once committed it
    is strictly newer than anything pruned here. Returns the number of
    directories deleted. ``keep_last <= 0`` keeps everything.
    """
    import shutil

    if keep_last <= 0:
        return 0
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return 0
    steps = sorted(
        (int(d.split("_", 1)[1]), d)
        for d in os.listdir(directory)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    )
    doomed = steps[:-keep_last] if keep_last < len(steps) else []
    for _, d in doomed:
        shutil.rmtree(os.path.join(directory, d), ignore_errors=True)
    return len(doomed)


def ensure_tag_scheme(directory: str, scheme: str) -> None:
    """Guard against mixing checkpoint tag numbering schemes in one
    directory ("epochs" vs global-batch "steps", the
    ``save_every_steps`` mode): tags are compared numerically by
    :func:`latest_step_dir` / :func:`prune_step_dirs`, so a resumed run
    that switches schemes would write tags BELOW the existing maximum —
    latest-discovery would keep resolving to the stale checkpoint and
    rotation would delete the new ones first. Records the scheme in a
    ``TAG_SCHEME`` marker file on first use and refuses a mismatch."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    marker = os.path.join(directory, "TAG_SCHEME")
    if os.path.exists(marker):
        with open(marker) as f:
            prev = f.read().strip()
        if prev != scheme:
            raise ValueError(
                f"checkpoint dir {directory} was written with tag scheme "
                f"'{prev}' but this run uses '{scheme}' (save_every_steps "
                f"{'on' if scheme == 'steps' else 'off'}); resume with the "
                f"same setting or use a fresh checkpoint dir"
            )
    else:
        with open(marker, "w") as f:
            f.write(scheme)


def latest_step_dir(directory: str) -> Optional[str]:
    """Most recent ``step_*`` checkpoint under ``directory`` for resume
    (the reference's manual ``start`` epoch rewiring, FCT.py:312)."""
    wait_for_async_saves()  # in-flight async dirs must be visible/complete
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = [
        (int(d.split("_", 1)[1]), d)
        for d in os.listdir(directory)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    ]
    if not steps:
        return None
    return os.path.join(directory, max(steps)[1])
