"""FSDP / ZeRO-3 sharding tests on the 8-virtual-CPU-device mesh.

Engagement is attested, not assumed (round-2 lesson): the
``fsdp_constrain`` dispatch marker must appear, per-device state bytes
must shrink ~axis-size-fold, and the updated params must come back
STILL sharded — all three fail if the path silently falls back to
plain replicated dp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tchvp_tpu.config import TransformerConfig, VideoModelConfig
from tchvp_tpu.models import VideoHybridNet
from tchvp_tpu.ops import dispatch_trace
from tchvp_tpu.parallel import fsdp_leaf_spec, make_mesh, replicate, shard_batch
from tchvp_tpu.parallel import fsdp as fsdp_lib
from tchvp_tpu.train import create_train_state, make_optimizer
from tchvp_tpu.train.steps import make_video_train_step

IMAGE = 32


def test_fsdp_leaf_spec_picks_largest_divisible_dim():
    from jax.sharding import PartitionSpec as P

    # (kh, kw, cin, cout): cout largest and divisible -> sharded there.
    assert fsdp_leaf_spec((3, 3, 128, 256), "data", 8) == P(
        None, None, None, "data"
    )
    # cin 384 > cout 256: largest divisible wins regardless of position.
    assert fsdp_leaf_spec((3, 3, 384, 256), "data", 8) == P(
        None, None, "data", None
    )
    # Small leaves replicate (BN scale of 512 floats < MIN_SHARD_ELEMS).
    assert fsdp_leaf_spec((512,), "data", 8) == P()
    # Indivisible leaves replicate.
    assert fsdp_leaf_spec((3, 3, 3, 100), "data", 8, min_elems=1) == P()
    # Axis size 1 replicates everything.
    assert fsdp_leaf_spec((1024, 1024), "data", 1) == P()


def _tiny_video_state(mesh=None, fsdp=False):
    cfg = VideoModelConfig(
        temporal=TransformerConfig(
            input_dim=(IMAGE // 4) ** 2, hidden_dim=32, num_layers=1,
            num_heads=4, dropout_rate=0.0,
        )
    )
    model = VideoHybridNet(config=cfg)
    clip0 = jnp.zeros((8, 2, IMAGE, IMAGE, 3), jnp.float32)
    state = create_train_state(
        model, clip0, make_optimizer(1e-3, grad_clip_norm=1.0),
        jax.random.PRNGKey(0),
    )
    if mesh is not None:
        state = (
            fsdp_lib.shard_train_state(state, mesh, "data")
            if fsdp else replicate(state, mesh)
        )
    return state


def _batch():
    return np.random.default_rng(0).integers(
        0, 255, (8, 2, IMAGE, IMAGE, 3), dtype=np.uint8
    )


def test_fsdp_step_matches_replicated_dp():
    """One ZeRO-3 train step == one replicated-dp train step, while the
    marker attests engagement, per-device bytes shrink, and the updated
    params remain sharded."""
    mesh = make_mesh(("data",))
    batch = shard_batch(_batch(), mesh)

    base_state = _tiny_video_state(mesh, fsdp=False)
    base_step = make_video_train_step(IMAGE, loss="mse")
    base_state, base_m = base_step(base_state, batch)

    z_state = _tiny_video_state(mesh, fsdp=True)

    # Sharded placement: per-device state bytes ~1/8 of global (small
    # leaves stay replicated, so allow up to 40%).
    global_b = fsdp_lib.global_size_bytes(
        {"p": z_state.params, "o": z_state.opt_state}
    )
    local_b = fsdp_lib.sharded_size_bytes(
        {"p": z_state.params, "o": z_state.opt_state}
    )
    assert local_b < 0.4 * global_b, (local_b, global_b)

    z_step = make_video_train_step(
        IMAGE, loss="mse", fsdp_axis="data", fsdp_mesh=mesh
    )
    with dispatch_trace.capture() as seen:
        z_state, z_m = z_step(z_state, batch)
        jax.block_until_ready(z_m["loss"])
    assert "fsdp_constrain" in seen, f"FSDP constraint not applied ({sorted(seen)})"

    np.testing.assert_allclose(
        float(z_m["loss"]), float(base_m["loss"]), rtol=1e-5
    )
    # Updated params math-identical (np.asarray gathers the shards).
    flat_z = jax.tree.leaves(z_state.params)
    flat_b = jax.tree.leaves(base_state.params)
    for a, b in zip(flat_z, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )
    # ...and STILL sharded after the update: the optimizer ran on shards.
    sharded_bytes = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in flat_z
        if any(s is not None for s in l.sharding.spec)
    )
    total_bytes = sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in flat_z)
    assert sharded_bytes > 0.5 * total_bytes, (
        f"updated params mostly replicated "
        f"({sharded_bytes}/{total_bytes} sharded bytes)"
    )


def test_fsdp_dormant_without_mesh():
    """fsdp_axis with no mesh anywhere degrades to plain dp (identity),
    and the marker correctly does NOT fire."""
    state = _tiny_video_state()
    step = make_video_train_step(IMAGE, loss="mse", fsdp_axis="data")
    with dispatch_trace.capture() as seen:
        state, m = step(state, jnp.asarray(_batch()))
        jax.block_until_ready(m["loss"])
    assert "fsdp_constrain" not in seen
    assert np.isfinite(float(m["loss"]))


def test_videoflow_fsdp_integration(tmp_path):
    """VideoFlow(fsdp_axis=...) shards state at init and trains a step."""
    from tchvp_tpu.config import TrainConfig
    from tchvp_tpu.train.loops import VideoFlow

    mesh = make_mesh(("data",))
    cfg = VideoModelConfig(
        temporal=TransformerConfig(
            input_dim=(IMAGE // 4) ** 2, hidden_dim=32, num_layers=1,
            num_heads=4, dropout_rate=0.0,
        )
    )
    model = VideoHybridNet(config=cfg)
    tc = TrainConfig(
        model_name="video", loss="mse", lr=1e-4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "runs"),
        sample_dir=str(tmp_path / "samples"),
    )
    flow = VideoFlow(
        model, cfg=tc, image_size=IMAGE, mesh=mesh, fsdp_axis="data"
    )
    state = flow.init_state(clip_len=2)
    # init_state sharded the params over the mesh.
    big = [
        l for l in jax.tree.leaves(state.params)
        if np.prod(l.shape) >= fsdp_lib.MIN_SHARD_ELEMS
        and any(s % 8 == 0 for s in l.shape)
    ]
    assert big and all(
        any(s is not None for s in l.sharding.spec) for l in big
    )
    flow.train([_batch()], epochs=1, clip_len=2, save_every=100)
    assert flow.state.step == 1
