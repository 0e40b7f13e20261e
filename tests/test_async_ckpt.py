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


def test_prune_step_dirs_keeps_newest(tmp_path):
    params = {"w": jnp.zeros((4,))}
    for step in (1, 5, 12, 20):
        ckpt.save_state(str(tmp_path), step, params)
    deleted = ckpt.prune_step_dirs(str(tmp_path), keep_last=2)
    assert deleted == 2
    left = sorted(d for d in tmp_path.iterdir() if d.name.startswith("step_"))
    assert [d.name for d in left] == ["step_12", "step_20"]
    # Survivors still restore.
    raw = ckpt.restore_state(str(tmp_path / "step_20"))
    assert int(raw["step"]) == 20


def test_prune_step_dirs_noop_cases(tmp_path):
    # keep_last<=0 keeps everything (reference behavior: .tar files
    # accumulate forever); missing dir is a no-op, not an error.
    params = {"w": jnp.zeros((2,))}
    ckpt.save_state(str(tmp_path), 3, params)
    assert ckpt.prune_step_dirs(str(tmp_path), keep_last=0) == 0
    assert ckpt.prune_step_dirs(str(tmp_path), keep_last=5) == 0
    assert (tmp_path / "step_3").is_dir()
    assert ckpt.prune_step_dirs(str(tmp_path / "nope"), keep_last=1) == 0


def test_prune_joins_inflight_async_save(tmp_path):
    params = {"w": jnp.arange(16.0)}
    ckpt.save_state(str(tmp_path), 1, params, async_write=True)
    ckpt.save_state(str(tmp_path), 2, params, async_write=True)
    deleted = ckpt.prune_step_dirs(str(tmp_path), keep_last=1)
    assert deleted == 1
    raw = ckpt.restore_state(str(tmp_path / "step_2"))
    np.testing.assert_allclose(raw["params"]["w"], np.arange(16.0))
