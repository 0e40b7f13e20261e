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
