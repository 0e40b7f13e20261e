"""Device-side input prefetch (tchvp_tpu/data/device_prefetch.py).

The wrapper must (1) yield the exact same batch stream, already placed
on device; (2) report the TRAINER's position, not the inflated inner
position (it pulls ahead by ``size``); (3) keep mid-epoch
checkpoint/resume exact when enabled on a real flow; (4) change nothing
about the training math.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tchvp_tpu.config import TrainConfig, TransformerConfig, VideoModelConfig
from tchvp_tpu.data.device_prefetch import DevicePrefetch
from tchvp_tpu.data.synthetic import SyntheticClips


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_yields_same_stream_on_device():
    mk = lambda: SyntheticClips(2, 4, 16, num_batches=5, seed=3)  # noqa: E731
    plain = [np.asarray(b) for b in mk()]
    wrapped = DevicePrefetch(mk(), size=2)
    got = list(wrapped)
    assert len(got) == len(plain) == len(wrapped)
    for g, p in zip(got, plain):
        assert isinstance(g, jax.Array)
        np.testing.assert_array_equal(np.asarray(g), p)


def test_size_larger_than_epoch_and_validation():
    with pytest.raises(ValueError):
        DevicePrefetch(SyntheticClips(2, 4, 16, num_batches=3), size=0)
    # Lookahead longer than the epoch: still yields every batch once.
    got = list(DevicePrefetch(SyntheticClips(2, 4, 16, num_batches=3, seed=0),
                              size=8))
    assert len(got) == 3


class _FakePositionable:
    """Minimal dataset with the repo's position contract: counts pulls
    from ITS iterator (so a lookahead consumer inflates it), normalizes
    the epoch-final position to (epoch+1, 0)."""

    def __init__(self, spe=5):
        self.spe = spe
        self.epoch = 0
        self.consumed = 0

    def __len__(self):
        return self.spe

    def __iter__(self):
        self.consumed = 0
        for i in range(self.spe):
            # Count BEFORE the yield, like manifest._counted /
            # clippack's iterators: after k next() calls, consumed == k.
            self.consumed = i + 1
            yield np.full((2, 2), i, np.float32)
        self.epoch += 1
        self.consumed = 0

    def position(self):
        if self.consumed >= self.spe:
            return {"epoch": self.epoch + 1, "batch": 0}
        return {"epoch": self.epoch, "batch": self.consumed}

    def seek(self, epoch, batch=0):
        self.epoch, self.consumed = epoch, batch


def test_position_subtracts_device_held_lookahead():
    data = _FakePositionable(spe=5)
    wrapped = DevicePrefetch(data, size=2)
    assert wrapped.position() == {"epoch": 0, "batch": 0}
    it = iter(wrapped)
    seen = []
    for b in it:
        seen.append(int(np.asarray(b)[0, 0]))
        # The wrapper pulled ahead, but position() must say the batch
        # the TRAINER will get next — one past what it just received.
        assert wrapped.position() == {
            "epoch": 0 if seen[-1] + 1 < 5 else 1,
            "batch": (seen[-1] + 1) % 5,
        }, f"after consuming batch {seen[-1]}"
    assert seen == [0, 1, 2, 3, 4]
    # Fully drained: wrapper agrees with the inner normalization. (The
    # inner _FakePositionable rolled its epoch counter in-generator, so
    # its own position already reads (1, 0) here.)
    assert wrapped.position() == {"epoch": 1, "batch": 0}


def test_position_near_epoch_end_with_held_batches():
    """Inner normalizes to (e+1, 0) while the wrapper still holds the
    tail batches — the wrapper must de-normalize to (e, spe-held)."""
    data = _FakePositionable(spe=3)
    wrapped = DevicePrefetch(data, size=2)
    it = iter(wrapped)
    first = next(it)  # inner already consumed all 3: inner pos (1, 0)
    assert int(np.asarray(first)[0, 0]) == 0
    assert data.position() == {"epoch": 1, "batch": 0}
    assert wrapped.position() == {"epoch": 0, "batch": 1}


def test_hasattr_mirrors_inner_dataset():
    wrapped = DevicePrefetch(SyntheticClips(2, 4, 16, num_batches=3), size=2)
    assert not hasattr(wrapped, "position")
    assert not hasattr(wrapped, "seek")
    assert hasattr(DevicePrefetch(_FakePositionable(), 2), "position")


def test_seek_guard_and_delegation():
    data = _FakePositionable(spe=4)
    wrapped = DevicePrefetch(data, size=2)
    wrapped.seek(3, 1)
    assert data.position() == {"epoch": 3, "batch": 1}
    it = iter(wrapped)
    next(it)
    with pytest.raises(RuntimeError):
        wrapped.seek(0, 0)


def _tiny_flow(cfg):
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.train.loops import VideoFlow

    model = VideoHybridNet(
        config=VideoModelConfig(
            temporal=TransformerConfig(
                input_dim=64, hidden_dim=32, num_layers=1, num_heads=4
            )
        )
    )
    return VideoFlow(model, cfg=cfg, image_size=32)


def test_training_parity_with_and_without_prefetch(workdir):
    """device_prefetch must not change the math: same data, same seed,
    bit-identical final parameters."""
    def run(dp):
        cfg = TrainConfig(model_name=f"VID_DP{dp}", loss="mse", lr=1e-4,
                          device_prefetch=dp)
        flow = _tiny_flow(cfg)
        flow.train(SyntheticClips(2, 4, 32, num_batches=3, seed=7),
                   epochs=2, clip_len=4, save_every=100)
        return flow.state

    s0, s2 = run(0), run(2)
    assert int(s0.step) == int(s2.step) == 6
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s0.params, s2.params,
    )


def test_mid_epoch_resume_exact_with_prefetch(workdir, tmp_path):
    """The checkpointed data position must reflect the TRAINER's
    progress, not the lookahead — resume seeks to the exact next batch
    with device prefetch enabled."""
    from tchvp_tpu.data import clippack

    rng = np.random.default_rng(0)
    clips = rng.integers(0, 256, (12, 4, 32, 32, 3), dtype=np.uint8)
    pack = str(tmp_path / "clips.cpk")
    clippack.pack_clips(pack, clips)
    mk = lambda: clippack.ClipPackDataset(  # noqa: E731
        pack, batch_size=4, seed=1, prefer_native=False)

    cfg = TrainConfig(model_name="VID_DPMID", loss="mse", lr=1e-4,
                      device_prefetch=2)
    flow = _tiny_flow(cfg)
    # 3 batches/epoch, save after batch 2 — at that moment the wrapper
    # has already pulled the whole epoch from the dataset (lookahead 2),
    # so an unadjusted position would record (1, 0) and the resume
    # would SKIP the third batch.
    flow.train(mk(), epochs=1, clip_len=4, save_every=10,
               save_every_steps=2)
    assert os.path.isdir("checkpoints/step_2")
    # Discard the clean-shutdown final save (step_3): this test resumes
    # from the mid-epoch cadence checkpoint, simulating preemption.
    import shutil

    shutil.rmtree("checkpoints/step_3")

    data2 = mk()
    flow2 = _tiny_flow(cfg)
    start = flow2.resume(clip_len=4, data=data2)
    assert start == 0  # re-enter the partial epoch
    assert data2.position() == {"epoch": 0, "batch": 2}
    flow2.train(data2, epochs=1, clip_len=4, save_every=10,
                save_every_steps=2)
    # Exactly the ONE remaining batch was served.
    assert int(flow2.state.step) == 1
    assert data2.position() == {"epoch": 1, "batch": 0}
