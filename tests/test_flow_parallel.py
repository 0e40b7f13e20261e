"""Flow-level multi-axis parallelism: VideoFlow + `tchvp video --mesh`.

Round-2's verdict proved that model-side sp/tp code can be dead under the
production training surface while every numeric test passes. These tests
pin the OPPOSITE property at the flow level: a `VideoFlow` built the way
`tchvp video --mesh data=K,seq=N` builds one actually traces its train
step through the shard_map cores (dispatch markers fire), and the sharded
loss matches the unsharded flow's loss on the same data.

The reference has no distributed training at all (single ``cuda:0``,
``FCT.py:276`` / ``Model.py:17``); this is build-new component ⊕C
(SURVEY §2.1) made reachable from the CLI.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tchvp_tpu.config import (
    ResNetAEConfig,
    TrainConfig,
    TransformerConfig,
    VideoModelConfig,
)
from tchvp_tpu.models import VideoHybridNet
from tchvp_tpu.ops import dispatch_trace
from tchvp_tpu.parallel import make_mesh
from tchvp_tpu.train.loops import VideoFlow

IMAGE = 32
CLIP = 4


def _model(**temporal_kw):
    temporal_kw.setdefault("num_layers", 1)
    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(token_latent=True),
        temporal=TransformerConfig(
            input_dim=(IMAGE // 4) ** 2,
            hidden_dim=32,
            num_heads=4,
            dropout_rate=0.0,
            **temporal_kw,
        ),
    )
    return VideoHybridNet(config=cfg)


def _clip_batch(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (8, CLIP, IMAGE, IMAGE, 3)).astype(np.uint8)


def _flow(model, mesh, tmp_path, tag, optimizer="adamw", **kw):
    tc = TrainConfig(
        model_name="video", loss="mse", lr=1e-4,
        optimizer=optimizer,
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        log_dir=str(tmp_path / f"runs_{tag}"),
        sample_dir=str(tmp_path / f"samples_{tag}"),
    )
    return VideoFlow(model, cfg=tc, image_size=IMAGE, mesh=mesh, **kw)


def _one_step(flow):
    """Run exactly one optimizer step through the flow's own plumbing
    (shard + mesh scope), returning the loss."""
    state = flow.state if flow.state is not None else flow.init_state(CLIP)
    flow.state = state
    batch = flow._shard(_clip_batch())
    new_state, metrics = flow._train_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    flow.state = new_state
    return float(metrics["loss"])


def test_videoflow_seq_parallel_engages(tmp_path):
    """VideoFlow on a data x seq mesh traces the seq shard_map core —
    the test FAILS if the step silently degrades to the GSPMD fallback
    (round-2 verdict, next-round item 1)."""
    mesh = make_mesh(("data", "seq"), (4, 2))
    model = _model(attn_impl="windowed", window_size=2, seq_axis="seq")
    flow = _flow(model, mesh, tmp_path, "sp", seq_axis="seq")
    with dispatch_trace.capture() as seen:
        loss = _one_step(flow)
    assert "seq_sharded_shard_map" in seen, seen
    assert "seq_sharded_fallback" not in seen, seen
    assert np.isfinite(loss)
    # The flow placed the clip's frame dim on the seq axis, so the
    # shard_map starts from local shards instead of resharding.
    clip = flow._shard(_clip_batch())
    assert clip.sharding.spec[0] == "data" and clip.sharding.spec[1] == "seq"


def test_videoflow_seq_parallel_matches_dp(tmp_path):
    """One sharded optimizer step == one unsharded step on the same
    batch (sequence parallelism must not change the math)."""
    mesh = make_mesh(("data", "seq"), (4, 2))
    sp = _flow(
        _model(attn_impl="windowed", window_size=2, seq_axis="seq"),
        mesh, tmp_path, "sp2", seq_axis="seq",
    )
    ref = _flow(
        _model(attn_impl="windowed", window_size=2),
        None, tmp_path, "ref",
    )
    l_sp, l_ref = _one_step(sp), _one_step(ref)
    assert np.isclose(l_sp, l_ref, rtol=1e-5, atol=1e-6), (l_sp, l_ref)
    # And after the update the params still agree.
    d0 = jax.tree.leaves(sp.state.params)[0]
    d1 = jax.tree.leaves(ref.state.params)[0]
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-5)


def test_videoflow_tensor_parallel_engages(tmp_path):
    """VideoFlow on a data x model mesh applies the tp activation
    constraints (marker, not just numerics)."""
    mesh = make_mesh(("data", "model"), (4, 2))
    model = _model(tp_axis="model")
    flow = _flow(model, mesh, tmp_path, "tp")
    with dispatch_trace.capture() as seen:
        loss = _one_step(flow)
    assert "tp_constrain" in seen, seen
    assert np.isfinite(loss)


def test_videoflow_expert_parallel_engages(tmp_path):
    """VideoFlow on a data x expert mesh routes MoE FFNs through the
    expert-sharded shard_map."""
    mesh = make_mesh(("data", "expert"), (4, 2))
    model = _model(num_experts=2, ep_axis="expert")
    flow = _flow(model, mesh, tmp_path, "ep")
    with dispatch_trace.capture() as seen:
        loss = _one_step(flow)
    assert "moe_ep_shard_map" in seen, seen
    assert np.isfinite(loss)


def test_videoflow_spatial_partition_engages(tmp_path):
    """VideoFlow on a data x spatial mesh: the conv stacks' row sharding
    applies (marker), the flow pre-shards the clip's frame-ROW dim, and
    one optimizer step matches the unsharded flow on the same batch."""
    mesh = make_mesh(("data", "spatial"), (2, 4))
    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(token_latent=True, sp_axis="spatial"),
        temporal=TransformerConfig(
            input_dim=(IMAGE // 4) ** 2,
            hidden_dim=32,
            num_layers=1,
            num_heads=4,
            dropout_rate=0.0,
        ),
    )
    flow = _flow(
        VideoHybridNet(config=cfg), mesh, tmp_path, "spt", sp_axis="spatial"
    )
    with dispatch_trace.capture() as seen:
        loss = _one_step(flow)
    assert "sp_constrain_conv" in seen, seen
    assert np.isfinite(loss)
    clip = flow._shard(_clip_batch())
    assert clip.sharding.spec[0] == "data"
    assert clip.sharding.spec[2] == "spatial"  # frame rows pre-sharded

    ref = _flow(_model(), None, tmp_path, "spt_ref")
    l_ref = _one_step(ref)
    assert np.isclose(loss, l_ref, rtol=1e-4, atol=1e-5), (loss, l_ref)


def test_videoflow_pipeline_parallel_engages(tmp_path):
    """VideoFlow on a data x pipe mesh (the `tchvp video --mesh
    data=K,pipe=N` shape): the GPipe body AND the stage-grad constraint
    trace through the flow's own step, stage params live sharded over
    "pipe", and one optimizer step matches the unpipelined flow on the
    same batch — pp-TRAINING reaching the production surface (round-3
    verdict item 1)."""
    mesh = make_mesh(("data", "pipe"), (2, 2), jax.devices()[:4])
    model = _model(num_layers=2)
    flow = _flow(model, mesh, tmp_path, "pp", pipe_axis="pipe")
    with dispatch_trace.capture() as seen:
        loss = _one_step(flow)
    assert "pipeline_shard_map" in seen, seen
    assert "pp_constrain" in seen, seen
    assert np.isfinite(loss)
    stage_leaf = jax.tree.leaves(flow.state.params["stages"])[0]
    assert stage_leaf.sharding.spec[0] == "pipe"

    ref = _flow(_model(num_layers=2), None, tmp_path, "pp_ref")
    l_ref = _one_step(ref)
    assert np.isclose(loss, l_ref, rtol=1e-5, atol=1e-6), (loss, l_ref)


def test_pp_checkpoint_serves_through_cli_loaders(tmp_path):
    """The pp-training -> serving journey (round 4): a checkpoint written
    by a `tchvp video --mesh pipe=N` run stores params in the pipelined
    {"rest","stages"} layout — every serving/eval consumer must accept it
    transparently. cli._restored_params merges it back to the flax
    layout (grouped stages included), and the merged tree drives
    model.apply to the exact same output as the live pipelined state."""
    from tchvp_tpu import cli
    from tchvp_tpu.parallel import is_pipelined_params, merge_pipelined_params
    from tchvp_tpu.train import checkpoint as ckpt

    mesh = make_mesh(("data", "pipe"), (2, 2), jax.devices()[:4])
    model = _model(num_layers=4)  # 2 layers/stage: grouped stacking
    flow = _flow(model, mesh, tmp_path, "ppserve", pipe_axis="pipe")
    _one_step(flow)
    path = ckpt.save_state(
        str(tmp_path / "ppck"), 1, flow.state.params,
        batch_stats=flow.state.batch_stats,
    )

    restored = ckpt.restore_state(path)
    assert is_pipelined_params(restored["params"])
    merged = cli._restored_params(restored, ema=False)
    assert not is_pipelined_params(merged) and "temporal" in merged

    # Exactness: serving from the checkpoint == the live pipelined state.
    want = merge_pipelined_params(flow.state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        merged, want,
    )
    variables = {"params": merged}
    if restored.get("batch_stats") is not None:
        variables["batch_stats"] = restored["batch_stats"]
    clip = jnp.asarray(_clip_batch(7)[:2], jnp.float32) / 255.0
    _, recon = model.apply(variables, clip, deterministic=True)
    assert np.isfinite(np.asarray(recon)).all()

    # CLI end-to-end: `tchvp video --mesh pipe=` writes a pp checkpoint,
    # plain (no-mesh) `tchvp infer --checkpoint` serves it.
    ckdir = str(tmp_path / "cli_pp")
    cli.main([
        "video", "--synthetic", "4", "--epochs", "1", "--batch-size", "4",
        "--image-size", str(IMAGE), "--clip-len", str(CLIP),
        "--layers", "2", "--mesh", "data=4,pipe=2",
        "--checkpoint-dir", ckdir,
    ])
    step_dir = ckpt.latest_step_dir(ckdir)
    assert step_dir is not None
    cli.main([
        "infer", "--synthetic", "1", "--batch-size", "2",
        "--image-size", str(IMAGE), "--clip-len", str(CLIP),
        "--layers", "2", "--checkpoint", step_dir,
    ])

    # A temporal-depth mismatch must fail LOUDLY: flax's apply silently
    # ignores extra layer params, so without the check the 4-layer
    # checkpoint above would serve through the default 2-layer model
    # with half the trained network (round-4 review finding).
    with pytest.raises(SystemExit, match="temporal depth"):
        cli.main([
            "infer", "--synthetic", "1", "--batch-size", "2",
            "--image-size", str(IMAGE), "--clip-len", str(CLIP),
            "--checkpoint", path,  # the 4-layer flow checkpoint
        ])


def test_restored_params_merges_pipelined_ema_payload():
    """`--ema` serving from a pp checkpoint: the EMA parameter average
    mirrors the params, so a pipelined run's EMA payload is ALSO in the
    {"rest","stages"} layout — _restored_params must merge it (and
    validate its depth) exactly like the live params."""
    from tchvp_tpu import cli
    from tchvp_tpu.parallel import merge_pipelined_params, split_video_params

    model = _model(num_layers=2)
    clip = jnp.zeros((1, CLIP, IMAGE, IMAGE, 3))
    params = model.init(jax.random.PRNGKey(0), clip)["params"]
    rest, stacked = split_video_params(params, 2)
    pipelined = {"rest": rest, "stages": stacked}
    # Serialized optax state: namedtuples become name-keyed dicts, so
    # EmaState shows up as {"ema": <pipelined param tree>}.
    restored = {"params": pipelined, "opt_state": [{"ema": pipelined}]}

    merged = cli._restored_params(restored, ema=True, expect_layers=2)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        merged, params,
    )
    with pytest.raises(SystemExit, match="temporal depth"):
        cli._restored_params(restored, ema=True, expect_layers=4)


def test_pp_checkpoint_exports_to_artifact(tmp_path):
    """The remaining consumer of the pp-train journey: `tchvp export
    --checkpoint <pp step>` bakes the merged weights into an AOT artifact
    and `tchvp infer --exported` serves it — checkpoint from a
    `--mesh data=K,pipe=N` run, artifact on plain devices."""
    from tchvp_tpu import cli
    from tchvp_tpu.train import checkpoint as ckpt

    ckdir = str(tmp_path / "ppx")
    cli.main([
        "video", "--synthetic", "2", "--epochs", "1", "--batch-size", "4",
        "--image-size", str(IMAGE), "--clip-len", str(CLIP),
        "--layers", "2", "--mesh", "data=4,pipe=2",
        "--checkpoint-dir", ckdir,
    ])
    step_dir = ckpt.latest_step_dir(ckdir)
    art = str(tmp_path / "pp.tchvp")
    cli.main([
        "export", "--model", "hybrid", "--out", art,
        "--image-size", str(IMAGE), "--clip-len", str(CLIP),
        "--layers", "2", "--checkpoint", step_dir,
        "--platforms", "cpu",
    ])
    cli.main([
        "infer", "--synthetic", "1", "--batch-size", "2",
        "--image-size", str(IMAGE), "--clip-len", str(CLIP),
        "--exported", art,
    ])


def _param_shaped_subtrees(opt_state, params):
    """All optimizer-state subtrees whose pytree structure mirrors the
    param tree (Adam mu/nu, EMA mirrors, ...), in deterministic walk
    order — the subtrees layout-elastic resume must CONVERT, not reset."""
    ps = jax.tree_util.tree_structure(params)
    found = []

    def walk(node):
        if (
            jax.tree_util.tree_structure(node) == ps
            and jax.tree_util.tree_leaves(node)
        ):
            found.append(node)
            return
        fields = getattr(node, "_fields", None)
        if fields is not None:
            for f in fields:
                walk(getattr(node, f))
        elif isinstance(node, dict):
            for k in node:
                walk(node[k])
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(opt_state)
    return found


def test_layout_elastic_resume(tmp_path):
    """Re-parallelize an existing run (round 4): VideoFlow.resume accepts
    a checkpoint whose param layout differs from the live flow — a
    monolithic run continues as `--mesh pipe=N` training and vice versa.
    Params/batch_stats convert exactly; optimizer MOMENTS convert too
    (round-5: the same split/stack/merge transforms — bitwise-equal in
    both directions, so a re-parallelized run continues with no Adam
    re-warmup), and the post-switch step exactly matches the
    uninterrupted run's next step."""
    from tchvp_tpu.parallel import merge_pipelined_params, split_video_params
    from tchvp_tpu.train import checkpoint as ckpt

    mesh = make_mesh(("data", "pipe"), (2, 2), jax.devices()[:4])

    # SGD-momentum flows: the trace buffer is a param-shaped moment (so
    # conversion is exercised) and updates are LINEAR in it, so the
    # post-switch step comparison is exact at fp32 tolerance (Adam
    # sign-normalizes near-zero grads — reassociation noise flips them
    # to full ±lr steps; same reasoning as the pp parity test).
    # monolithic run -> checkpoint -> pipelined flow resumes it
    mono = _flow(_model(num_layers=2), None, tmp_path, "ler", optimizer="sgd")
    _one_step(mono)
    ckpt.save_state(
        mono.cfg.checkpoint_dir, 1, mono.state.params,
        opt_state=mono.state.opt_state, batch_stats=mono.state.batch_stats,
        extra={"train_epoch": 1},
    )
    # Numpy snapshot of the CHECKPOINTED params: mono trains further
    # below (and its steps donate the live buffers), but the EMA leg at
    # the end resumes from THIS checkpoint and must compare against it.
    params_at_ckpt = jax.tree.map(np.asarray, mono.state.params)
    pp = _flow(
        _model(num_layers=2), mesh, tmp_path, "ler",
        pipe_axis="pipe", optimizer="sgd",
    )
    start = pp.resume(CLIP)
    assert start == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        merge_pipelined_params(pp.state.params), mono.state.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        pp.state.batch_stats, mono.state.batch_stats,
    )

    # Adam moments came through the SAME layout conversion, bitwise:
    # mono's (nonzero after a step) mu/nu split+stacked == pp's restored.
    def mono_to_pp(tree):
        rest, stacked = split_video_params(tree, 2)
        return {"rest": rest, "stages": stacked}

    mono_moms = _param_shaped_subtrees(mono.state.opt_state, mono.state.params)
    pp_moms = _param_shaped_subtrees(pp.state.opt_state, pp.state.params)
    assert len(mono_moms) == len(pp_moms) >= 1  # SGD momentum trace
    assert any(
        float(jnp.abs(l).max()) > 0
        for m in mono_moms
        for l in jax.tree.leaves(m)
    )  # the moments being compared are not trivially zero
    for mm, pm in zip(mono_moms, pp_moms):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            mono_to_pp(mm), pm,
        )

    # No re-warmup: with moments AND step count restored, the post-switch
    # pp step equals the uninterrupted monolithic run's next step (same
    # rng => same noise/keys; pipeline parity is exact at dropout 0).
    # COPY the key: both states donate their buffers in their steps —
    # aliasing one rng buffer into both would delete it under the first
    # step and crash the second.
    pp.state = pp.state.replace(rng=jnp.array(mono.state.rng, copy=True))
    _one_step(pp)
    _one_step(mono)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        ),
        merge_pipelined_params(pp.state.params), mono.state.params,
    )

    # pipelined run -> checkpoint -> monolithic flow resumes it
    ckpt.save_state(
        str(tmp_path / "ckpt_ler2"), 3, pp.state.params,
        opt_state=pp.state.opt_state, batch_stats=pp.state.batch_stats,
        extra={"train_epoch": 3},
    )
    mono2 = _flow(_model(num_layers=2), None, tmp_path, "ler2", optimizer="sgd")
    start = mono2.resume(CLIP)
    assert start == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        mono2.state.params, merge_pipelined_params(pp.state.params),
    )
    # Moments converted pp -> mono, bitwise.
    pp_moms2 = _param_shaped_subtrees(pp.state.opt_state, pp.state.params)
    mono2_moms = _param_shaped_subtrees(
        mono2.state.opt_state, mono2.state.params
    )
    for pm, mm in zip(pp_moms2, mono2_moms):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            merge_pipelined_params(pm), mm,
        )
    assert np.isfinite(_one_step(mono2))

    # EMA optimizer across the layout switch: the fresh opt_state must
    # seed its param snapshot from the CONVERTED weights, not the
    # discarded random init (round-4 review finding) — otherwise
    # `--ema` serving is dominated by random weights for ~1/(1-decay)
    # steps after a re-parallelization.
    from tchvp_tpu.train.state import ema_params

    tc = TrainConfig(
        model_name="video", loss="mse", lr=1e-4, ema_decay=0.999,
        checkpoint_dir=mono.cfg.checkpoint_dir,
        log_dir=str(tmp_path / "runs_ler3"),
        sample_dir=str(tmp_path / "samples_ler3"),
    )
    ppe = VideoFlow(
        _model(num_layers=2), cfg=tc, image_size=IMAGE, mesh=mesh,
        pipe_axis="pipe",
    )
    ppe.resume(CLIP)
    ema = ema_params(ppe.state.opt_state)
    assert ema is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        merge_pipelined_params(ema), params_at_ckpt,
    )


def test_videoflow_pipe_rejects_bad_compositions(tmp_path):
    mesh = make_mesh(("data", "pipe"), (2, 2), jax.devices()[:4])
    # fsdp_axis now COMPOSES with pipe (round-5 pp x ZeRO); qat and
    # seq_axis remain rejected.
    with pytest.raises(ValueError, match="does not compose"):
        _flow(
            _model(num_layers=2), mesh, tmp_path, "ppbad",
            pipe_axis="pipe", qat=True,
        )
    with pytest.raises(ValueError, match="needs a mesh"):
        _flow(_model(num_layers=2), None, tmp_path, "ppbad2",
              pipe_axis="pipe")
    with pytest.raises(ValueError, match="not an axis"):
        _flow(
            _model(num_layers=2), mesh, tmp_path, "ppbad3",
            pipe_axis="pipe", fsdp_axis="nonexistent",
        )


def test_videoflow_pipe_checkpoint_roundtrip(tmp_path):
    """Pipelined-layout states checkpoint and resume: stage-sharded
    params + moments go through the shard-wise orbax path and restore
    INTO the live shardings of a freshly built flow."""
    from tchvp_tpu.train import checkpoint as ckpt

    mesh = make_mesh(("data", "pipe"), (2, 2), jax.devices()[:4])
    flow = _flow(_model(num_layers=2), mesh, tmp_path, "ppck",
                 pipe_axis="pipe")
    _one_step(flow)
    st = flow.state
    ckpt.save_state(
        flow.cfg.checkpoint_dir, 1, st.params, st.opt_state, st.batch_stats
    )

    flow2 = _flow(_model(num_layers=2), mesh, tmp_path, "ppck",
                  pipe_axis="pipe")
    start = flow2.resume(CLIP)
    assert start == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0
        ),
        st.params, flow2.state.params,
    )
    # Restored stage leaves landed back on the pipe axis.
    leaf = jax.tree.leaves(flow2.state.params["stages"])[0]
    assert leaf.sharding.spec[0] == "pipe"
    # And the restored state steps.
    l2 = _one_step(flow2)
    assert np.isfinite(l2)


def test_cli_video_pipe_end_to_end(tmp_path):
    """`tchvp video --mesh data=4,pipe=2` trains one epoch on synthetic
    clips — the full production surface (CLI -> flow -> pipelined step ->
    checkpoint) on the virtual mesh."""
    from tchvp_tpu import cli
    from tchvp_tpu.ops import dispatch_trace

    with dispatch_trace.capture() as seen:
        cli.main([
            # batch 8: each accum chunk (8/2 = 4) must still split over
            # data=4 (pick_microbatches feasibility).
            "video", "--synthetic", "1", "--batch-size", "8",
            "--image-size", str(IMAGE), "--clip-len", str(CLIP),
            "--mesh", "data=4,pipe=2", "--layers", "2",
            # Round-5 compositions through the SAME production surface:
            # ZeRO-sharded rest params/moments, gradient accumulation,
            # routed-MoE temporal stack (per-microbatch aux estimator).
            "--fsdp", "--accum-steps", "2", "--num-experts", "2",
            "--epochs", "1", "--save-every", "1",
            "--checkpoint-dir", str(tmp_path / "ck"),
        ])
    assert "pipeline_shard_map" in seen, sorted(seen)
    assert "pp_constrain" in seen
    assert "fsdp_constrain" in seen, sorted(seen)
    import os

    assert any(
        d.startswith("step_") for d in os.listdir(tmp_path / "ck")
    )


def test_cli_video_validates_pipe_axis(tmp_path):
    """`tchvp video --mesh pipe=N` guards: layer divisibility and the
    non-composing flags are rejected up front."""
    from tchvp_tpu import cli

    base = ["video", "--synthetic", "1", "--batch-size", "4",
            "--image-size", str(IMAGE), "--clip-len", str(CLIP),
            "--checkpoint-dir", str(tmp_path / "c")]
    with pytest.raises(SystemExit, match="multiple of pipe"):
        cli.main(base + ["--mesh", "data=2,pipe=4", "--layers", "2"])
    # --fsdp COMPOSES with pipe since round 5 (pp x ZeRO) — --qat is the
    # rejected flag now.
    with pytest.raises(SystemExit, match="does not compose"):
        cli.main(base + ["--mesh", "data=4,pipe=2", "--layers", "2",
                         "--qat"])
    with pytest.raises(SystemExit, match="composes with data"):
        cli.main(base + ["--mesh", "seq=2,pipe=4", "--layers", "4",
                         "--window", "2"])


def test_cli_mesh_parsing():
    """--mesh axis=size parsing + device-count validation."""
    from tchvp_tpu.cli import _parse_mesh_axes

    assert _parse_mesh_axes("data=4,seq=2") == {"data": 4, "seq": 2}
    assert _parse_mesh_axes("") == {}
    with pytest.raises(SystemExit):
        _parse_mesh_axes("data:4")


def test_cli_mesh_builds_multi_axis():
    from types import SimpleNamespace

    from tchvp_tpu.cli import _mesh

    mesh = _mesh(SimpleNamespace(mesh="data=4,seq=2", data_parallel=False))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "seq": 2,
    }
    with pytest.raises(SystemExit):
        _mesh(SimpleNamespace(mesh="data=3", data_parallel=False))
    assert _mesh(SimpleNamespace(mesh=None, data_parallel=False)) is None


def test_cli_segment_rejects_unsupported_axes(tmp_path):
    """`tchvp segment --mesh model=N` is rejected up front — segment
    routes only data= and spatial=."""
    from tchvp_tpu import cli

    with pytest.raises(SystemExit, match="unsupported mesh axes"):
        cli.main([
            "segment", "--synthetic", "1", "--batch-size", "4",
            "--image-size", "64", "--mesh", "data=4,model=2",
            "--checkpoint-dir", str(tmp_path / "c"),
        ])


def test_cli_video_validates_seq_axis(tmp_path):
    """`tchvp video --mesh seq=N` without a windowed/ring attention
    config is rejected up front (the model would raise mid-trace)."""
    import sys
    from unittest import mock

    from tchvp_tpu import cli

    argv = ["tchvp", "video", "--synthetic", "1", "--batch-size", "4",
            "--image-size", str(IMAGE), "--clip-len", str(CLIP),
            "--mesh", "data=4,seq=2",
            "--checkpoint-dir", str(tmp_path / "c")]
    with mock.patch.object(sys, "argv", argv):
        with pytest.raises(SystemExit, match="--window"):
            cli.main()
