"""EMA parameter averaging tests (train/state.py::param_ema — build-new;
the reference keeps no parameter averages)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tchvp_tpu.train import checkpoint as ckpt
from tchvp_tpu.train.state import (
    EmaState,
    TrainState,
    ema_params,
    make_optimizer,
    param_ema,
    with_ema_params,
)

DECAY = 0.9


def _params():
    return {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([0.5])}


def test_ema_matches_manual_recursion():
    tx = optax.chain(optax.sgd(0.1), param_ema(DECAY))
    params = _params()
    opt = tx.init(params)
    manual_ema = jax.tree.map(lambda x: np.asarray(x), params)
    g = {"w": jnp.asarray([1.0, -1.0]), "b": jnp.asarray([2.0])}
    for _ in range(5):
        u, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, u)
        manual_ema = jax.tree.map(
            lambda e, p: DECAY * e + (1 - DECAY) * np.asarray(p),
            manual_ema, params,
        )
    got = ema_params(opt)
    for k in params:
        np.testing.assert_allclose(np.asarray(got[k]), manual_ema[k], rtol=1e-6)


def test_ema_params_found_through_wrappers():
    """make_optimizer composes EMA with frozen subtrees + apply_if_finite;
    extraction must see through every wrapper."""
    params = {"encoder": {"w": jnp.ones((3,))}, "decoder": {"w": jnp.ones((3,))}}
    tx = make_optimizer(
        1e-2, frozen_prefixes=("encoder",), skip_nonfinite_updates=3,
        ema_decay=DECAY,
    )
    opt = tx.init(params)
    assert ema_params(opt) is not None
    g = jax.tree.map(jnp.ones_like, params)
    u, opt = tx.update(g, opt, params)
    params2 = optax.apply_updates(params, u)
    e = ema_params(opt)
    # EMA moved toward the updated params.
    np.testing.assert_allclose(
        np.asarray(e["decoder"]["w"]),
        DECAY * 1.0 + (1 - DECAY) * np.asarray(params2["decoder"]["w"]),
        rtol=1e-6,
    )
    # Frozen subtree: update is zero, EMA stays at the (unchanged) param.
    np.testing.assert_allclose(np.asarray(e["encoder"]["w"]), 1.0, rtol=1e-6)
    # A NaN step must not pollute the average (apply_if_finite skips it).
    bad = jax.tree.map(lambda x: x * jnp.nan, g)
    u, opt = tx.update(bad, opt, params2)
    np.testing.assert_allclose(
        np.asarray(ema_params(opt)["decoder"]["w"]), np.asarray(e["decoder"]["w"])
    )

    # No EMA configured -> None.
    tx0 = make_optimizer(1e-2)
    assert ema_params(tx0.init(params)) is None


def test_ema_checkpoint_roundtrip(tmp_path):
    """EmaState survives save_state -> restore_state_into (the by-name
    namedtuple retype, round-2 advisor fix) with values intact."""
    params = _params()
    tx = make_optimizer(1e-2, ema_decay=DECAY, skip_nonfinite_updates=2)
    state = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, tx=tx,
        batch_stats=None, rng=jax.random.PRNGKey(0),
    )
    g = jax.tree.map(jnp.ones_like, params)
    state = state.apply_gradients(grads=g)
    want = ema_params(state.opt_state)
    path = ckpt.save_state(
        str(tmp_path), 1, state.params, opt_state=state.opt_state
    )
    fresh = TrainState.create(
        apply_fn=lambda *a, **k: None, params=_params(), tx=tx,
        batch_stats=None, rng=jax.random.PRNGKey(0),
    )
    restored, _ = ckpt.restore_state_into(fresh, path)
    got = ema_params(restored.opt_state)
    for k in params:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]))


def test_with_ema_params_swap():
    params = _params()
    tx = make_optimizer(1e-2, ema_decay=DECAY)
    state = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, tx=tx,
        batch_stats=None, rng=jax.random.PRNGKey(0),
    )
    state = state.apply_gradients(grads=jax.tree.map(jnp.ones_like, params))
    swapped = with_ema_params(state)
    np.testing.assert_allclose(
        np.asarray(swapped.params["w"]),
        np.asarray(ema_params(state.opt_state)["w"]),
    )
    # Without EMA: identity.
    tx0 = make_optimizer(1e-2)
    s0 = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, tx=tx0,
        batch_stats=None, rng=jax.random.PRNGKey(0),
    )
    assert with_ema_params(s0) is s0


def test_param_ema_validates_decay():
    with pytest.raises(ValueError):
        param_ema(0.0)
    with pytest.raises(ValueError):
        param_ema(1.0)
    assert isinstance(EmaState(ema=None), tuple)


def test_donated_step_with_ema_and_nan_guard():
    """The DONATED video train step must run with ema_decay and
    skip_nonfinite_updates on: both optax transforms initialize their
    state as the param tree itself (param_ema's init, apply_if_finite's
    last_finite), which aliased live param buffers and crashed Execute()
    with 'donate the same buffer twice' — caught driving `tchvp video
    --ema-decay` on the chip (round 3). create_train_state now de-aliases
    the fresh optimizer state."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tchvp_tpu.config import ResNetAEConfig, TransformerConfig, VideoModelConfig
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.train import create_train_state, make_optimizer
    from tchvp_tpu.train.steps import make_video_train_step

    size = 16
    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(layers=(1, 1), token_latent=True),
        temporal=TransformerConfig(
            input_dim=(size // 4) ** 2, hidden_dim=8, num_layers=1, num_heads=2
        ),
    )
    model = VideoHybridNet(config=cfg)
    state = create_train_state(
        model,
        jnp.zeros((2, 2, size, size, 3)),
        make_optimizer(1e-3, ema_decay=0.9, skip_nonfinite_updates=2),
        jax.random.PRNGKey(0),
    )
    # No optimizer-state leaf may alias a param buffer (or another leaf).
    ids = [id(l) for l in jax.tree.leaves(state.params)]
    ids += [
        id(l) for l in jax.tree.leaves(state.opt_state)
        if isinstance(l, jax.Array)
    ]
    assert len(ids) == len(set(ids)), "aliased buffers in fresh train state"

    step = make_video_train_step(size, loss="mse")
    batch = np.random.default_rng(0).integers(
        0, 255, (2, 2, size, size, 3), dtype=np.uint8
    )
    state, m = step(state, jnp.asarray(batch))  # donates state
    state, m = step(state, jnp.asarray(batch))
    assert np.isfinite(float(m["loss"]))
