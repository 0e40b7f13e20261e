"""Sharding-planner truthfulness tests.

The contract of ``parallel/plan.py`` is that a plan is NOT a parallel
re-implementation of placement policy: its specs must equal what the
runtime actually does. These tests pin the plan, leaf by leaf, against
the live ``shard_train_state`` placement on the real 8-virtual-device
mesh — if the planner and the runtime ever drift, the zip below fails.
"""

import io
from contextlib import redirect_stdout

import jax
import jax.numpy as jnp
import pytest

from tchvp_tpu.config import TransformerConfig, VideoModelConfig
from tchvp_tpu.models import VideoHybridNet
from tchvp_tpu.parallel import fsdp as fsdp_lib
from tchvp_tpu.parallel import make_mesh
from tchvp_tpu.parallel.plan import (
    abstract_train_state,
    plan_state,
)
from tchvp_tpu.train import create_train_state, make_optimizer

IMAGE = 32


def _tiny_model(num_experts: int = 0):
    cfg = VideoModelConfig(
        temporal=TransformerConfig(
            input_dim=(IMAGE // 4) ** 2, hidden_dim=32, num_layers=1,
            num_heads=4, dropout_rate=0.0, num_experts=num_experts,
        )
    )
    return VideoHybridNet(config=cfg)


def _flat_with_paths(tree):
    out = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
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
        out["/".join(parts)] = leaf
    return out


def test_plan_specs_match_live_fsdp_placement():
    """Every param + opt_state leaf: plan spec == shard_train_state spec."""
    model = _tiny_model()
    clip0 = jnp.zeros((8, 2, IMAGE, IMAGE, 3), jnp.float32)
    tx = make_optimizer(1e-3)
    state = create_train_state(model, clip0, tx, jax.random.PRNGKey(0))
    mesh = make_mesh(("data",))
    axis_size = mesh.shape["data"]
    live = fsdp_lib.shard_train_state(state, mesh, "data")

    abstract = abstract_train_state(model, clip0, tx)
    plan = plan_state(
        abstract, {"data": axis_size}, fsdp_axis="data"
    )

    for section, live_tree in (
        ("params", live.params),
        ("opt_state", live.opt_state),
    ):
        live_leaves = _flat_with_paths(live_tree)
        rows = {r.path: r for r in plan.section(section)}
        assert set(rows) == set(live_leaves), (
            f"{section}: plan/live leaf paths diverge"
        )
        checked_sharded = 0
        for path, leaf in live_leaves.items():
            live_spec = tuple(leaf.sharding.spec)
            # Live replicated leaves normalize to P() — pad to ndim.
            live_spec = live_spec + (None,) * (leaf.ndim - len(live_spec))
            assert rows[path].spec == live_spec, (
                f"{section}:{path}: plan {rows[path].spec} != live {live_spec}"
            )
            if any(live_spec):
                checked_sharded += 1
                assert rows[path].origin == "fsdp"
        assert checked_sharded > 0, f"{section}: nothing was FSDP-sharded"


def test_plan_bytes_accounting():
    model = _tiny_model()
    clip0 = jnp.zeros((2, 2, IMAGE, IMAGE, 3), jnp.float32)
    abstract = abstract_train_state(model, clip0, make_optimizer(1e-3))
    plan = plan_state(
        abstract, {"data": 8}, fsdp_axis="data",
        batch_axis="data",
        batch_example={"clip": jax.ShapeDtypeStruct(
            (8, 2, IMAGE, IMAGE, 3), jnp.float32)},
    )
    for r in plan.rows:
        factor = 1
        for s, dim in zip(r.spec, r.shape):
            if s is not None:
                factor *= plan.axes[s]
                assert dim % plan.axes[s] == 0, (
                    f"{r.path}: sharded dim {dim} not divisible"
                )
        assert r.bytes_device * factor == r.bytes_global, r.path
    totals = plan.totals()
    # grads mirror params exactly (constrain_gradients uses the same specs).
    assert totals["grads"] == totals["params"]
    assert plan.device_total() == sum(d for _, d in totals.values())
    # Sharding must actually shrink the per-device footprint.
    pg, pd = totals["params"]
    assert pd < pg
    # The batch rides the data axis: exactly 1/8 per device.
    bg, bd = totals["batch"]
    assert bd * 8 == bg


def test_plan_ep_leaves_follow_moe_shard_map_specs():
    """Expert weights plan as P(ep_axis) on dim 0 — exactly the in_specs
    ops/moe.py::_moe_ep_shard_map maps them with."""
    model = _tiny_model(num_experts=4)
    clip0 = jnp.zeros((2, 2, IMAGE, IMAGE, 3), jnp.float32)
    abstract = abstract_train_state(model, clip0, make_optimizer(1e-3))
    plan = plan_state(
        abstract, {"data": 2, "expert": 2},
        ep_axis="expert", num_experts=4,
    )
    ep_rows = [r for r in plan.section("params") if r.origin == "ep"]
    names = {r.path.rsplit("/", 1)[-1] for r in ep_rows}
    assert names == {"w1", "b1", "w2", "b2"}
    for r in ep_rows:
        assert r.spec[0] == "expert" and not any(r.spec[1:])
        assert r.shape[0] == 4  # expert-leading, the dim being sharded
        assert r.bytes_device * 2 == r.bytes_global
    # The router weight is NOT expert-led and must not be ep-sharded.
    router = [r for r in plan.section("params") if r.path.endswith("router")]
    assert router and all(r.origin != "ep" for r in router)


def test_plan_without_parallelism_is_fully_replicated():
    model = _tiny_model()
    clip0 = jnp.zeros((2, 2, IMAGE, IMAGE, 3), jnp.float32)
    abstract = abstract_train_state(model, clip0, make_optimizer(1e-3))
    plan = plan_state(abstract, {"data": 1})
    assert all(not any(r.spec) for r in plan.rows)
    totals = plan.totals()
    assert all(g == d for g, d in totals.values())


def test_cli_shards_smoke():
    from tchvp_tpu.cli import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        main([
            "shards", "--model", "hybrid", "--image-size", "32",
            "--clip-len", "2", "--mesh", "data=8", "--fsdp",
            "--batch-size", "8",
        ])
    out = buf.getvalue()
    assert "Sharding plan" in out and "data=8" in out
    assert "fsdp" in out  # at least one FSDP-placed leaf in the top table
    assert "reduce-scatter" in out  # the collectives note


def test_cli_shards_rejects_bad_mesh():
    from tchvp_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["shards", "--model", "hybrid", "--mesh", "data:8"])


def test_plan_specs_match_live_pipelined_placement():
    """pp x ZeRO planning (round 5): with `pipe_axis` the plan's specs
    must equal the LIVE `create_pipelined_train_state(fsdp_axis=...)`
    placement leaf-by-leaf — stage params/moments over "pipe", large
    rest (CNN) leaves over "data", small leaves replicated."""
    from tchvp_tpu.parallel import create_pipelined_train_state
    from tchvp_tpu.parallel.plan import abstract_pipelined_train_state

    cfg = VideoModelConfig(
        temporal=TransformerConfig(
            input_dim=(IMAGE // 4) ** 2, hidden_dim=32, num_layers=2,
            num_heads=4, dropout_rate=0.0,
        )
    )
    model = VideoHybridNet(config=cfg)
    example = jnp.zeros((1, 2, IMAGE, IMAGE, 3))
    tx = make_optimizer(1e-3)
    mesh = make_mesh(("data", "pipe"), (4, 2))
    live = create_pipelined_train_state(
        model, example, tx, jax.random.PRNGKey(0),
        mesh=mesh, axis="pipe", fsdp_axis="data",
    )

    abstract = abstract_pipelined_train_state(model, example, tx, 2)
    plan = plan_state(
        abstract, {"data": 4, "pipe": 2},
        fsdp_axis="data", pipe_axis="pipe",
    )

    n_pipe = n_fsdp = 0
    for section, live_tree in (
        ("params", live.params),
        ("opt_state", live.opt_state),
    ):
        live_leaves = _flat_with_paths(live_tree)
        rows = {r.path: r for r in plan.section(section)}
        assert set(rows) == set(live_leaves), (
            f"{section}: plan/live leaf paths diverge"
        )
        for path, leaf in live_leaves.items():
            live_spec = tuple(leaf.sharding.spec)
            live_spec = live_spec + (None,) * (leaf.ndim - len(live_spec))
            assert rows[path].spec == live_spec, (
                f"{section}:{path}: plan {rows[path].spec} != live {live_spec}"
            )
            if rows[path].origin == "pipe":
                n_pipe += 1
            elif rows[path].origin == "fsdp":
                n_fsdp += 1
    assert n_pipe > 0 and n_fsdp > 0, (n_pipe, n_fsdp)

    # Planner rejects indivisible stage counts like the runtime.
    with pytest.raises(ValueError, match="multiple of the stage count"):
        abstract_pipelined_train_state(model, example, tx, 3)


def test_cli_shards_pipe_smoke():
    """`tchvp shards --mesh data=4,pipe=2` prints a pipelined-layout
    plan with the pp note and stage rows over 'pipe'."""
    from tchvp_tpu import cli

    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main([
            "shards", "--model", "hybrid", "--mesh", "data=4,pipe=2",
            "--layers", "2", "--image-size", str(IMAGE),
            "--clip-len", "2", "--fsdp",
        ])
    out = buf.getvalue()
    assert "pipeline-parallel over 'pipe'(2)" in out
    assert "ZeRO-shard over the data axis" in out
    assert "stages/" in out and "P(pipe" in out
    with pytest.raises(SystemExit, match="multiple of pipe"):
        cli.main([
            "shards", "--model", "hybrid", "--mesh", "data=4,pipe=2",
            "--layers", "3", "--image-size", str(IMAGE), "--clip-len", "2",
        ])
