"""Failure detection / recovery (build-new aux subsystem, survey §5.3):
in-graph non-finite update skipping, host-side loss monitoring, and
checkpoint-based recovery in the video flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tchvp_tpu.train.health import HealthMonitor, TrainingDiverged
from tchvp_tpu.train.state import make_optimizer


def test_monitor_flags_nan_and_spike():
    m = HealthMonitor(spike_factor=5.0, warmup_steps=2, nan_tolerance=2)
    assert m.check(1.0) == "ok"
    assert m.check(1.1) == "ok"
    assert m.check(0.9) == "ok"
    assert m.check(50.0) == "spike"
    assert not m.diverged
    assert m.check(float("nan")) == "nan"
    assert not m.diverged
    assert m.check(float("inf")) == "nan"
    assert m.diverged
    # Recovery resets the streak.
    m.consecutive_nan = 0
    assert m.check(1.0) == "ok"
    s = m.summary()
    assert s["nan_steps"] == 2 and s["spike_steps"] == 1


def test_optimizer_skips_nonfinite_updates():
    """apply_if_finite: a NaN gradient must leave params untouched."""
    tx = make_optimizer(0.1, skip_nonfinite_updates=3)
    params = {"w": jnp.ones((4,))}
    opt = tx.init(params)

    good = {"w": jnp.full((4,), 0.5)}
    bad = {"w": jnp.array([1.0, jnp.nan, 1.0, 1.0])}

    up, opt = tx.update(bad, opt, params)
    p_after_bad = optax.apply_updates(params, up)
    np.testing.assert_array_equal(np.asarray(p_after_bad["w"]), np.ones(4))

    up, opt = tx.update(good, opt, p_after_bad)
    p_after_good = optax.apply_updates(p_after_bad, up)
    assert not np.allclose(np.asarray(p_after_good["w"]), np.ones(4))


def test_optimizer_skip_composes_with_frozen_subtree():
    tx = make_optimizer(
        0.1, frozen_prefixes=("enc",), skip_nonfinite_updates=2
    )
    params = {"enc": {"w": jnp.ones(3)}, "dec": {"w": jnp.ones(3)}}
    opt = tx.init(params)
    g = {"enc": {"w": jnp.full(3, 0.7)}, "dec": {"w": jnp.full(3, 0.7)}}
    up, opt = tx.update(g, opt, params)
    new = optax.apply_updates(params, up)
    np.testing.assert_array_equal(np.asarray(new["enc"]["w"]), np.ones(3))
    assert not np.allclose(np.asarray(new["dec"]["w"]), np.ones(3))


def test_video_flow_recovers_from_nan(tmp_path):
    """Sustained NaN loss: the flow restores the last step-tagged
    checkpoint instead of continuing on garbage."""
    from tchvp_tpu.config import ResNetAEConfig, TrainConfig, TransformerConfig, VideoModelConfig
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.train.loops import VideoFlow

    size = 16
    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(layers=(1, 1), token_latent=True),
        temporal=TransformerConfig(
            input_dim=(size // 4) ** 2, hidden_dim=8, num_layers=1, num_heads=2
        ),
    )
    model = VideoHybridNet(config=cfg)
    tc = TrainConfig(
        loss="mse",
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        model_name="video_health",
    )
    flow = VideoFlow(model, cfg=tc, image_size=size)

    clean = [np.random.default_rng(0).integers(0, 255, (2, 2, size, size, 3), dtype=np.uint8)]
    # One good epoch that writes a checkpoint (save_every=1).
    flow.train(clean, epochs=1, clip_len=2, save_every=1)
    good_params = jax.tree.map(np.asarray, flow.state.params)

    # Poison params AND optimizer moments — a real NaN-gradient divergence
    # leaves Adam's m/v NaN too. Recovery must restore both, or the first
    # post-restore update re-poisons the restored params (ADVICE r1).
    def poison_floats(x):
        x = jnp.asarray(x)
        return x * jnp.nan if jnp.issubdtype(x.dtype, jnp.floating) else x

    flow.state = flow.state.replace(
        params=jax.tree.map(poison_floats, flow.state.params),
        opt_state=jax.tree.map(poison_floats, flow.state.opt_state),
    )
    nan_batches = clean * 5
    mon = HealthMonitor(nan_tolerance=2, warmup_steps=0)
    flow.train(nan_batches, epochs=2, clip_len=2, start_epoch=1,
               save_every=100, health=mon)
    restored = jax.tree.map(np.asarray, flow.state.params)
    # The first leaf should again be finite (restored from disk).
    leaf = jax.tree.leaves(restored)[0]
    assert np.isfinite(leaf).all()
    # Optimizer moments restored finite as well...
    for x in jax.tree.leaves(jax.tree.map(np.asarray, flow.state.opt_state)):
        if np.issubdtype(x.dtype, np.floating):
            assert np.isfinite(x).all()
    # ...so further clean steps make progress instead of re-diverging.
    flow.train(clean, epochs=3, clip_len=2, start_epoch=2, save_every=100)
    for x in jax.tree.leaves(jax.tree.map(np.asarray, flow.state.params)):
        assert np.isfinite(x).all()

    # Without any checkpoint on disk, divergence must raise.
    flow2 = VideoFlow(model, cfg=TrainConfig(
        loss="mse", checkpoint_dir=str(tmp_path / "empty"),
        log_dir=str(tmp_path / "logs2"), model_name="video_health2",
    ), image_size=size)
    flow2.init_state(clip_len=2)
    flow2.state = flow2.state.replace(
        params=jax.tree.map(lambda p: p * np.nan, flow2.state.params)
    )
    with pytest.raises(TrainingDiverged):
        flow2.train(nan_batches, epochs=1, clip_len=2,
                    health=HealthMonitor(nan_tolerance=2, warmup_steps=0))


def test_restore_state_into_apply_if_finite(tmp_path):
    """Resume with skip_nonfinite_updates>0: ApplyIfFiniteState's fields
    are NOT alphabetical (notfinite_count, last_finite, total_notfinite,
    inner_state), so a flat-leaf-order retype silently permutes optimizer
    leaves — e.g. an inner Adam moment lands in notfinite_count (round-2
    advisor, medium). The name-aware retype must reproduce every leaf in
    its right slot and the right node types."""
    import flax.linen as nn

    from tchvp_tpu.train import checkpoint as ckpt
    from tchvp_tpu.train.state import create_train_state

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(nn.relu(nn.Dense(5)(x)))

    model = Tiny()
    x = jnp.ones((2, 4))
    tx = make_optimizer(1e-2, skip_nonfinite_updates=4)
    state = create_train_state(model, x, tx, jax.random.PRNGKey(0))

    # Take a couple of real steps so moments are distinctive (nonzero).
    def loss_fn(p):
        return jnp.mean(model.apply({"params": p}, x) ** 2)

    for _ in range(3):
        grads = jax.grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)

    path = ckpt.save_state(
        str(tmp_path / "ck"), int(state.step), state.params,
        opt_state=state.opt_state,
    )

    fresh = create_train_state(model, x, tx, jax.random.PRNGKey(1))
    restored, _ = ckpt.restore_state_into(fresh, path)

    # Same node types (namedtuples, not dicts/lists)...
    assert jax.tree.structure(restored.opt_state) == jax.tree.structure(
        state.opt_state
    )
    # ...and every leaf exactly where it was saved.
    for got, want in zip(
        jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # The counters specifically (the fields a permutation would corrupt).
    assert int(restored.opt_state.notfinite_count) == int(
        state.opt_state.notfinite_count
    )
    assert int(restored.opt_state.total_notfinite) == int(
        state.opt_state.total_notfinite
    )
