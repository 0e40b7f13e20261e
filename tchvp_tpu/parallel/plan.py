"""Sharding planner: where every byte of a training config lives, BEFORE
committing a chip.

Build-new production tool (the reference trains on one ``cuda:0`` with no
placement story at all — ``FCT.py:276``, ``Model.py:17``): given a model,
an optimizer, a mesh shape, and this repo's parallelism knobs (dp / fsdp /
ep), report the PartitionSpec and per-device bytes of every parameter,
gradient, and optimizer-state leaf, plus totals against an HBM budget.

Truthfulness contract: the planner does NOT re-implement placement
heuristics — it calls the SAME functions the runtime uses
(:func:`tchvp_tpu.parallel.fsdp.fsdp_leaf_spec` for FSDP placement and
gradient constraints; the expert-leaf rule mirrors
``ops/moe.py::_moe_ep_shard_map``'s ``in_specs``), and
``tests/test_plan.py`` pins plan specs against the live
``shard_train_state`` placement on a real mesh so the two cannot drift.

Everything is abstract (``jax.eval_shape``): planning a 256-chip pod
works on a laptop with no devices and no weights.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax

from tchvp_tpu.parallel.fsdp import MIN_SHARD_ELEMS, fsdp_leaf_spec

# Leaf param names of ops/moe.py::MoEFFN whose leading dim is the expert
# dim — exactly the operands _moe_ep_shard_map maps with P(ep_axis).
_EP_LEAF_NAMES = frozenset({"w1", "b1", "w2", "b2"})


@dataclasses.dataclass(frozen=True)
class LeafPlan:
    """One array's placement: where it lives and what it costs."""

    section: str  # params | grads | opt_state | batch_stats | batch
    path: str
    shape: Tuple[int, ...]
    dtype: str
    spec: Tuple[Optional[str], ...]  # PartitionSpec entries, None=replicated
    bytes_global: int
    bytes_device: int
    origin: str  # fsdp | ep | batch | replicated

    @property
    def spec_str(self) -> str:
        if not any(self.spec):
            return "replicated"
        return "P(" + ", ".join(str(s) for s in self.spec) + ")"


@dataclasses.dataclass
class ShardingPlan:
    axes: Dict[str, int]
    rows: List[LeafPlan]
    notes: List[str] = dataclasses.field(default_factory=list)

    def section(self, name: str) -> List[LeafPlan]:
        return [r for r in self.rows if r.section == name]

    def totals(self) -> Dict[str, Tuple[int, int]]:
        """{section: (bytes_global, bytes_device)}."""
        out: Dict[str, Tuple[int, int]] = {}
        for r in self.rows:
            g, d = out.get(r.section, (0, 0))
            out[r.section] = (g + r.bytes_global, d + r.bytes_device)
        return out

    def device_total(self) -> int:
        return sum(r.bytes_device for r in self.rows)

    def table(self, top: int = 12, hbm_gb: float = 16.0) -> str:
        mesh = " × ".join(f"{k}={v}" for k, v in self.axes.items()) or "1 device"
        lines = [f"Sharding plan — mesh {{{mesh}}} "
                 f"({max(1, math.prod(self.axes.values()))} devices)", ""]
        totals = self.totals()
        order = ("params", "grads", "opt_state", "batch_stats", "batch")
        lines.append(f"{'section':<12} {'global':>12} {'per-device':>12}")
        for sec in order:
            if sec not in totals:
                continue
            g, d = totals[sec]
            lines.append(f"{sec:<12} {_human(g):>12} {_human(d):>12}")
        dev = self.device_total()
        lines.append(f"{'TOTAL':<12} "
                     f"{_human(sum(g for g, _ in totals.values())):>12} "
                     f"{_human(dev):>12}")
        budget = hbm_gb * (1 << 30)
        lines.append(
            f"\nper-device state = {_human(dev)} of {hbm_gb:g} GiB HBM "
            f"({100 * dev / budget:.1f}%) — activations/workspace NOT "
            f"included (bound via remat_policy / accum_steps)"
        )
        biggest = sorted(self.rows, key=lambda r: -r.bytes_device)[:top]
        lines.append(f"\nlargest {len(biggest)} leaves by per-device bytes:")
        lines.append(f"{'per-dev':>10} {'spec':<22} {'origin':<10} path")
        for r in biggest:
            path = r.path if len(r.path) <= 64 else "…" + r.path[-63:]
            lines.append(
                f"{_human(r.bytes_device):>10} {r.spec_str:<22} "
                f"{r.origin:<10} {r.section}:{path}"
            )
        if self.notes:
            lines.append("\nexpected collectives / placement notes:")
            lines.extend(f"  - {n}" for n in self.notes)
        return "\n".join(lines)


def _human(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024 or unit == "TiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:.1f} TiB"


def _leaf_spec(
    path: str,
    shape: Tuple[int, ...],
    axes: Dict[str, int],
    fsdp_axis: Optional[str],
    ep_axis: Optional[str],
    num_experts: int,
    min_elems: int,
    pipe_axis: Optional[str] = None,
) -> Tuple[Tuple[Optional[str], ...], str]:
    """(spec, origin) for one state leaf — the runtime's own rules."""
    name = path.rsplit("/", 1)[-1]
    if (
        pipe_axis
        and axes.get(pipe_axis, 1) > 1
        and "stages" in path.split("/")
        and shape
    ):
        # parallel/pipeline.py::pipeline_state_shardings: every leaf
        # under a "stages" key shards its leading (stage) dim over the
        # pipe axis — params AND their optimizer moments.
        return (pipe_axis,) + (None,) * (len(shape) - 1), "pipe"
    if (
        ep_axis
        and axes.get(ep_axis, 1) > 1
        and num_experts > 1
        and shape
        and shape[0] == num_experts
        and name in _EP_LEAF_NAMES
    ):
        # ops/moe.py::_moe_ep_shard_map in_specs: expert weights P(ep_axis).
        return (ep_axis,) + (None,) * (len(shape) - 1), "ep"
    if fsdp_axis and axes.get(fsdp_axis, 1) > 1:
        spec = tuple(fsdp_leaf_spec(shape, fsdp_axis, axes[fsdp_axis], min_elems))
        if any(spec):
            return spec, "fsdp"
    return (None,) * len(shape), "replicated"


def _flatten(tree: Any) -> List[Tuple[str, Any]]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "name"):
                parts.append(str(k.name))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        out.append(("/".join(parts), leaf))
    return out


def _shard_factor(spec: Sequence[Optional[str]], axes: Dict[str, int]) -> int:
    f = 1
    for s in spec:
        if s is not None:
            f *= axes.get(s, 1)
    return f


def plan_state(
    state: Any,
    axes: Dict[str, int],
    *,
    fsdp_axis: Optional[str] = None,
    ep_axis: Optional[str] = None,
    num_experts: int = 0,
    batch_axis: Optional[str] = None,
    batch_example: Any = None,
    min_elems: int = MIN_SHARD_ELEMS,
    pipe_axis: Optional[str] = None,
) -> ShardingPlan:
    """Plan placement for a (possibly abstract) TrainState.

    ``state`` is anything with ``params`` / ``opt_state`` /
    ``batch_stats`` attributes — typically the output of
    :func:`abstract_train_state`. ``axes`` maps mesh axis name → size.
    Gradients are planned from the param shapes with the SAME specs
    ``parallel/fsdp.py::constrain_gradients`` applies inside the step.

    ``pipe_axis``: the state is in the PIPELINED layout
    (:func:`abstract_pipelined_train_state` — ``{"rest", "stages"}``);
    stage leaves plan with their leading dim over the pipe axis exactly
    as ``pipeline_state_shardings`` places them, and ``fsdp_axis``
    composes on the non-stage leaves (pp x ZeRO).
    """

    rows: List[LeafPlan] = []

    def add(section: str, tree: Any) -> None:
        if tree is None:
            return
        for path, leaf in _flatten(tree):
            shape = tuple(getattr(leaf, "shape", ()) or ())
            dtype = getattr(leaf, "dtype", None)
            itemsize = getattr(dtype, "itemsize", 4)
            spec, origin = _leaf_spec(
                path, shape, axes, fsdp_axis, ep_axis, num_experts,
                min_elems, pipe_axis,
            )
            size = int(math.prod(shape)) * itemsize if shape else itemsize
            rows.append(
                LeafPlan(
                    section=section,
                    path=path,
                    shape=shape,
                    dtype=str(dtype),
                    spec=spec,
                    bytes_global=size,
                    bytes_device=size // _shard_factor(spec, axes),
                    origin=origin,
                )
            )

    add("params", state.params)
    add("grads", state.params)  # same shapes; constrain_gradients same specs
    add("opt_state", state.opt_state)
    add("batch_stats", getattr(state, "batch_stats", None))

    if batch_example is not None:
        for path, leaf in _flatten(batch_example):
            shape = tuple(leaf.shape)
            itemsize = leaf.dtype.itemsize
            spec: Tuple[Optional[str], ...] = (None,) * len(shape)
            if batch_axis and axes.get(batch_axis, 1) > 1:
                spec = (batch_axis,) + (None,) * (len(shape) - 1)
            size = int(math.prod(shape)) * itemsize
            rows.append(
                LeafPlan(
                    section="batch",
                    path=path or "batch",
                    shape=shape,
                    dtype=str(leaf.dtype),
                    spec=spec,
                    bytes_global=size,
                    bytes_device=size // _shard_factor(spec, axes),
                    origin="batch",
                )
            )

    notes: List[str] = []
    dp = axes.get(batch_axis, 1) if batch_axis else 1
    if fsdp_axis and axes.get(fsdp_axis, 1) > 1:
        notes.append(
            f"FSDP over '{fsdp_axis}'({axes[fsdp_axis]}): all-gather each "
            "sharded param at use; dp grad reduction lowers to "
            "reduce-scatter; optimizer update runs on shards"
        )
    elif dp > 1:
        notes.append(
            f"data-parallel over '{batch_axis}'({dp}): one grad all-reduce "
            "(psum) per step, params replicated"
        )
    if ep_axis and axes.get(ep_axis, 1) > 1 and num_experts > 1:
        notes.append(
            f"expert-parallel over '{ep_axis}'({axes[ep_axis]}): "
            f"{num_experts} experts resident {num_experts // axes[ep_axis]}"
            "/device, one psum combines MoE layer outputs"
        )
    if pipe_axis and axes.get(pipe_axis, 1) > 1:
        notes.append(
            f"pipeline-parallel over '{pipe_axis}'({axes[pipe_axis]}): "
            "stage params + moments live stage-local; activations hop "
            "one ppermute per GPipe tick; 'rest' (CNN) leaves "
            + ("ZeRO-shard over the data axis (pp x fsdp)"
               if fsdp_axis and axes.get(fsdp_axis, 1) > 1
               else "replicate (pass --fsdp to ZeRO-shard them)")
        )
    return ShardingPlan(axes=dict(axes), rows=rows, notes=notes)


def abstract_train_state(model, example: Any, tx, init_kwargs=None):
    """The TrainState's shapes/dtypes without allocating any weights.

    ``jax.eval_shape`` over :func:`tchvp_tpu.train.state.create_train_state`
    — runs in milliseconds on the host for any model size."""
    from tchvp_tpu.train.state import create_train_state

    def build(rng):
        return create_train_state(model, example, tx, rng, init_kwargs)

    return jax.eval_shape(build, jax.random.PRNGKey(0))


def abstract_pipelined_train_state(model, example: Any, tx, n_stages: int):
    """Abstract TrainState in the PIPELINED param layout
    (``{"rest", "stages"}`` — the same split/stack/group transforms
    ``create_pipelined_train_state`` applies, minus device placement),
    so ``tchvp shards --mesh data=K,pipe=N`` plans a pp(-x-ZeRO) run
    without touching a chip."""
    from tchvp_tpu.parallel.pipeline import group_stages, split_video_params
    from tchvp_tpu.train.state import TrainState

    tcfg = model.config.temporal
    if tcfg.num_layers % n_stages:
        raise ValueError(
            f"{tcfg.num_layers} temporal layers over {n_stages} stages: "
            f"num_layers must be a multiple of the stage count"
        )

    def build(rng):
        variables = model.init(rng, example)
        rest, stacked = split_video_params(
            variables["params"], tcfg.num_layers
        )
        if tcfg.num_layers // n_stages > 1:
            stacked = group_stages(stacked, n_stages)
        return TrainState.create(
            apply_fn=model.apply,
            params={"rest": rest, "stages": stacked},
            tx=tx,
            batch_stats=variables.get("batch_stats"),
            rng=rng,
        )

    return jax.eval_shape(build, jax.random.PRNGKey(0))
