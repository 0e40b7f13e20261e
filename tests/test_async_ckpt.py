"""Async checkpoint tests (train/checkpoint.py::save_state(async_write=))."""

import jax
import jax.numpy as jnp
import numpy as np

from tchvp_tpu.train import checkpoint as ckpt


def test_async_save_then_restore_roundtrip(tmp_path):
    params = {"w": jnp.arange(8.0), "b": jnp.ones((3,))}
    path = ckpt.save_state(
        str(tmp_path), 7, params, extra={"note": np.asarray([1, 2])},
        async_write=True,
    )
    # restore waits for the in-flight write itself.
    raw = ckpt.restore_state(path)
    np.testing.assert_allclose(raw["params"]["w"], np.arange(8.0))
    assert int(raw["step"]) == 7


def test_latest_step_dir_sees_inflight_async_save(tmp_path):
    params = {"w": jnp.zeros((4,))}
    ckpt.save_state(str(tmp_path), 1, params, async_write=True)
    ckpt.save_state(str(tmp_path), 2, params, async_write=True)
    latest = ckpt.latest_step_dir(str(tmp_path))
    assert latest is not None and latest.endswith("step_2")
    raw = ckpt.restore_state(latest)
    assert int(raw["step"]) == 2


def test_wait_for_async_saves_is_idempotent():
    ckpt.wait_for_async_saves()
    ckpt.wait_for_async_saves()
