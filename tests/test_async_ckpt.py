"""Async checkpoint tests (train/checkpoint.py::save_state(async_write=))."""

import os

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


def test_retype_rejects_extra_checkpoint_keys():
    """A checkpoint that is a SUPERSET of the live state must raise, not
    silently drop the extra subtrees (a user restoring a bigger model's
    checkpoint into a smaller model should hear about it)."""
    import pytest

    live = {"a": np.zeros(2), "b": np.zeros(3)}
    payload = {"a": np.zeros(2), "b": np.zeros(3), "extra_head": np.zeros(4)}
    with pytest.raises(ValueError, match="extra_head"):
        ckpt._retype(live, payload)


def test_prune_does_not_join_inflight_async_saves(tmp_path):
    """prune after save_state(async_write=True) must NOT block on the
    in-flight write (joining would re-serialize the train loop and
    negate async checkpointing — round-3 review finding) and must never
    doom it: an in-flight orbax tmp dir fails the step_<digits> filter,
    and once committed the newest dirs survive rotation."""
    params = {"w": jnp.arange(16.0)}
    ckpt.save_state(str(tmp_path), 1, params, async_write=True)
    ckpt.save_state(str(tmp_path), 2, params, async_write=True)
    # Prune runs immediately (possibly while step_2 is still in flight);
    # it may see 0, 1, or 2 committed dirs and deletes all but the newest.
    deleted = ckpt.prune_step_dirs(str(tmp_path), keep_last=1)
    assert deleted in (0, 1)
    # The newest checkpoint is always readable afterwards (restore joins).
    raw = ckpt.restore_state(str(tmp_path / "step_2"))
    np.testing.assert_allclose(raw["params"]["w"], np.arange(16.0))
    # Once everything committed, rotation converges to keep_last dirs.
    ckpt.wait_for_async_saves()
    ckpt.prune_step_dirs(str(tmp_path), keep_last=1)
    left = sorted(d for d in os.listdir(tmp_path) if d.startswith("step_"))
    assert left == ["step_2"]
