"""LR schedule tests (train/state.py::make_lr_schedule — build-new;
the reference is constant-LR everywhere: FCT.py:305, Model.py:153)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tchvp_tpu.train.state import lr_at, make_lr_schedule, make_optimizer


def test_constant_is_scalar_parity():
    assert make_lr_schedule(1e-3) == 1e-3
    assert lr_at(make_lr_schedule(1e-3), 123) == 1e-3


def test_constant_with_warmup():
    s = make_lr_schedule(1e-3, "constant", warmup_steps=10)
    assert lr_at(s, 0) == 0.0
    np.testing.assert_allclose(lr_at(s, 5), 5e-4)
    np.testing.assert_allclose(lr_at(s, 10), 1e-3)
    np.testing.assert_allclose(lr_at(s, 1000), 1e-3)  # held after warmup


def test_cosine_endpoints_and_monotone_decay():
    s = make_lr_schedule(
        1e-3, "cosine", warmup_steps=10, total_steps=100, min_lr_ratio=0.1
    )
    assert lr_at(s, 0) == 0.0
    np.testing.assert_allclose(lr_at(s, 10), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(lr_at(s, 100), 1e-4, rtol=1e-5)
    vals = [lr_at(s, t) for t in range(10, 101, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_cosine_requires_total_steps():
    with pytest.raises(ValueError, match="total_steps"):
        make_lr_schedule(1e-3, "cosine")
    with pytest.raises(ValueError, match="unknown schedule"):
        make_lr_schedule(1e-3, "polynomial")


def test_optimizer_updates_follow_schedule():
    """AdamW update magnitude tracks the schedule: zero at step 0 of a
    warmup, ~lr afterwards (Adam normalizes to ~±lr)."""
    tx = make_optimizer(1e-3, schedule="constant", warmup_steps=5)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}
    opt = tx.init(params)
    u0, opt = tx.update(grads, opt, params)
    np.testing.assert_allclose(np.asarray(u0["w"]), 0.0)  # lr(0) == 0
    for _ in range(6):
        u, opt = tx.update(grads, opt, params)
    assert 1e-4 < float(jnp.abs(u["w"]).max()) <= 1.2e-3  # lr ramped in
    # sanity: the default remains exactly optax.adamw(lr) semantics
    tx_plain = make_optimizer(1e-3)
    ref = optax.chain(optax.adamw(1e-3, weight_decay=0.01))
    o1, o2 = tx_plain.init(params), ref.init(params)
    a, _ = tx_plain.update(grads, o1, params)
    b, _ = ref.update(grads, o2, params)
    np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]))


# ---------------------------------------------------------------------------
# Optimizer zoo (make_optimizer(optimizer=...) — the reference is AdamW-only,
# FCT.py:305 / Model.py:153)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name,ref",
    [
        ("adamw", lambda lr: optax.adamw(lr, weight_decay=0.01)),
        ("adam", lambda lr: optax.adam(lr)),
        ("sgd", lambda lr: optax.sgd(lr, momentum=0.9, nesterov=True)),
        ("lion", lambda lr: optax.lion(lr, weight_decay=0.01)),
    ],
)
def test_optimizer_zoo_matches_bare_optax(name, ref):
    """Each --optimizer choice produces exactly the bare optax updates
    (no clipping / transforms engaged at defaults except the core)."""
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 0.3), "b": jnp.full((4,), -0.7)}

    tx = make_optimizer(1e-3, optimizer=name)
    want_tx = ref(1e-3)
    got, _ = tx.update(grads, tx.init(params), params)
    want, _ = want_tx.update(grads, want_tx.init(params), params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-6, atol=1e-8
        )


def test_optimizer_zoo_rejects_unknown():
    with pytest.raises(ValueError, match="unknown optimizer"):
        make_optimizer(1e-3, optimizer="adafactor")


def test_lion_state_checkpoint_roundtrip(tmp_path):
    """Lion's ScaleByLionState must survive the untemplated checkpoint
    retype path (train/checkpoint.py::_retype matches namedtuple fields
    by NAME, not flat order)."""
    import jax

    from tchvp_tpu.train import checkpoint as ckpt
    from tchvp_tpu.train.state import create_train_state
    from tchvp_tpu.models import Autoencoder4K

    model = Autoencoder4K()
    tx = make_optimizer(1e-3, optimizer="lion", grad_clip_norm=1.0,
                        skip_nonfinite_updates=2)
    state = create_train_state(
        model, jnp.zeros((1, 64, 64, 3)), tx, jax.random.PRNGKey(0)
    )
    path = ckpt.save_state(
        str(tmp_path), 5, state.params, state.opt_state, state.batch_stats
    )
    restored, _ = ckpt.restore_state_into(state, path)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.opt_state, restored.opt_state,
    )
