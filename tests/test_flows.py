"""End-to-end flow tests: each workload trains on synthetic data, writes
checkpoints/logs/samples, and improves or at least computes finite losses.

This formalizes the reference's implicit test strategy (survey §4): smoke
chains + scalar monitoring, now as real assertions.
"""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tchvp_tpu.config import TrainConfig, TransformerConfig, VideoModelConfig
from tchvp_tpu.data.synthetic import (
    SyntheticClips,
    SyntheticImageMasks,
    SyntheticImages,
)


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_denoising_flow(workdir):
    from tchvp_tpu.train.loops import DenoisingFlow

    cfg = TrainConfig(loss="mse", lr=1e-4, save_every=2, model_name="AE_TEST")
    flow = DenoisingFlow(cfg=cfg, image_size=64)
    data = SyntheticImages(2, 64, 2)
    state = flow.fit(data, data, data, epochs=2)
    assert state.step == 4  # 2 epochs x 2 batches
    # Best-val weights-only ckpt + periodic full ckpt exist.
    assert os.path.isdir("checkpoints/AE_TEST")
    assert os.path.isdir("checkpoints/step_2")
    # TensorBoard event file + JSONL metrics written.
    assert glob.glob("runs/AE_TEST/events.out.tfevents.*")
    assert os.path.exists("runs/AE_TEST/metrics.jsonl")
    # Inpainting test wrote a side-by-side sample.
    assert glob.glob("saved_samples/AE_TEST/*.jpg")


def test_segmentation_flow_train_restore_infer(workdir):
    from tchvp_tpu.train import checkpoint as ckpt
    from tchvp_tpu.train.loops import SegmentationFlow

    cfg = TrainConfig(model_name="FCT_TEST", loss="dice", lr=1e-4)
    flow = SegmentationFlow(cfg=cfg, image_size=32)
    data = SyntheticImageMasks(1, 32, 2)
    flow.train(data, epochs=1)
    assert glob.glob("saved_samples/FCT_TEST/*_predicted.jpg")

    # Restore the best ckpt into a fresh flow and run working inference
    # (the reference's infer is broken; ours must not be — survey §7.5).
    path = ckpt.latest_step_dir("checkpoints")
    assert path is not None
    flow2 = SegmentationFlow(cfg=cfg, image_size=32)
    flow2.restore(path)
    # Full resume contract (FCT.py:368-373): optimizer moments and the
    # whole loss-history list come back, not just weights.
    import jax

    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, flow.state.opt_state)),
        jax.tree.leaves(jax.tree.map(np.asarray, flow2.state.opt_state)),
    ):
        np.testing.assert_array_equal(a, b)
    assert flow2.loss_history == pytest.approx(flow.loss_history)
    batch = np.random.default_rng(0).integers(0, 256, (2, 32, 32, 3), np.uint8)
    masks = flow2.infer(batch, out_dir="inference_out")
    assert masks.shape == (2, 32, 32, 1)
    assert np.all((masks >= 0) & (masks <= 1))
    assert len(glob.glob("inference_out/*.jpg")) == 2


def test_transfer_flow_freezes_encoder(workdir):
    import jax

    from tchvp_tpu.train.loops import TransferFlow

    cfg = TrainConfig(model_name="XFER_TEST", loss="dice")
    flow = TransferFlow(cfg=cfg, image_size=64)
    flow.init_from_pretrained(None, lr=1e-3)
    enc_before = jax.tree.map(np.asarray, flow.state.params["encoder"])
    dec_before = jax.tree.map(np.asarray, flow.state.params["decoder"])
    flow.train(SyntheticImageMasks(1, 64, 2), epochs=1)
    enc_after = flow.state.params["encoder"]
    dec_after = flow.state.params["decoder"]
    # Encoder frozen (AE_32K L237-238), decoder training.
    for b, a in zip(jax.tree.leaves(enc_before), jax.tree.leaves(enc_after)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    changed = any(
        not np.array_equal(np.asarray(b), np.asarray(a))
        for b, a in zip(jax.tree.leaves(dec_before), jax.tree.leaves(dec_after))
    )
    assert changed

    # Per-epoch sneak-peek dumps (AE_32K L194-215, invoked at L292-293).
    assert glob.glob("saved_samples/XFER_TEST/*_predicted.jpg")

    # test_a_sample (L313-326): side-by-side input|pred panels.
    preds = flow.test_a_sample(SyntheticImageMasks(4, 64, 1), batch_size=3)
    assert preds.shape == (3, 64, 64, 1)
    assert len(glob.glob("saved_samples/XFER_TEST_test/*.jpg")) == 3

    # Resume from the latent_to_mask ckpt (L245): params + opt moments.
    flow2 = TransferFlow(cfg=cfg, image_size=64)
    flow2.init_from_pretrained(None, lr=1e-3)
    start = flow2.resume()
    assert start == 1
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, flow.state.params)),
        jax.tree.leaves(jax.tree.map(np.asarray, flow2.state.params)),
    ):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, flow.state.opt_state)),
        jax.tree.leaves(jax.tree.map(np.asarray, flow2.state.opt_state)),
    ):
        np.testing.assert_array_equal(a, b)


def test_video_flow_train_and_resume(workdir):
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.train.loops import VideoFlow

    cfg = TrainConfig(model_name="VID_TEST", loss="mse", lr=1e-4)
    model = VideoHybridNet(
        config=VideoModelConfig(
            temporal=TransformerConfig(
                input_dim=64, hidden_dim=32, num_layers=1, num_heads=4
            )
        )
    )
    flow = VideoFlow(model, cfg=cfg, image_size=32)
    data = SyntheticClips(1, 4, 32, 2)
    flow.train(data, epochs=2, clip_len=4, save_every=2)
    assert os.path.isdir("checkpoints/step_2")

    # Resume from the step-tagged checkpoint (AE_256_32K resume pattern).
    flow2 = VideoFlow(model, cfg=cfg, image_size=32)
    start = flow2.resume(clip_len=4)
    assert start == 2
    # Optimizer moments resumed, not reinitialized.
    import jax

    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, flow.state.opt_state)),
        jax.tree.leaves(jax.tree.map(np.asarray, flow2.state.opt_state)),
    ):
        np.testing.assert_array_equal(a, b)
    flow2.train(data, epochs=3, clip_len=4, start_epoch=start, save_every=10)


def test_video_flow_always_saves_final_state(workdir):
    """A finished run keeps its final state even when epochs is not a
    multiple of save_every (found driving `tchvp video --epochs 2` with
    the default --save-every 10: the whole run was silently discarded)."""
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.train import checkpoint as ckpt_lib
    from tchvp_tpu.train.loops import VideoFlow

    cfg = TrainConfig(model_name="VID_FINAL", loss="mse", lr=1e-4,
                      checkpoint_dir="ckpt_final")
    model = VideoHybridNet(
        config=VideoModelConfig(
            temporal=TransformerConfig(
                input_dim=64, hidden_dim=32, num_layers=1, num_heads=4
            )
        )
    )
    flow = VideoFlow(model, cfg=cfg, image_size=32)
    data = SyntheticClips(1, 4, 32, 2)
    flow.train(data, epochs=2, clip_len=4, save_every=10)
    path = ckpt_lib.latest_step_dir("ckpt_final")
    assert path is not None and path.endswith("step_2")
    # And no double-save when the epoch cadence already covered it.
    flow2 = VideoFlow(model, cfg=TrainConfig(
        model_name="VID_FINAL2", loss="mse", lr=1e-4,
        checkpoint_dir="ckpt_final2"), image_size=32)
    flow2.train(data, epochs=2, clip_len=4, save_every=2)
    assert ckpt_lib.latest_step_dir("ckpt_final2").endswith("step_2")


def test_video_flow_mid_epoch_checkpoint_resume(workdir, tmp_path):
    """``save_every_steps`` checkpoints WITHIN an epoch, recording the
    dataset position; ``resume(data=...)`` seeks the clippack iterator to
    the exact next batch — preemption-tolerant training with no replayed
    or skipped batches (the reference resumes only at epoch granularity,
    FCT.py:312)."""
    from tchvp_tpu.data import clippack
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.train.loops import VideoFlow

    rng = np.random.default_rng(0)
    clips = rng.integers(0, 256, (12, 4, 32, 32, 3), dtype=np.uint8)
    pack = str(tmp_path / "clips.cpk")
    clippack.pack_clips(pack, clips)

    cfg = TrainConfig(model_name="VID_MID", loss="mse", lr=1e-4)
    model = VideoHybridNet(
        config=VideoModelConfig(
            temporal=TransformerConfig(
                input_dim=64, hidden_dim=32, num_layers=1, num_heads=4
            )
        )
    )
    flow = VideoFlow(model, cfg=cfg, image_size=32)
    data = clippack.ClipPackDataset(
        pack, batch_size=4, seed=1, prefer_native=False
    )
    # 3 batches/epoch; the step cadence fires after EVERY batch, epoch
    # boundary included (the user asked for one per batch — the epoch-end
    # save with save_every=10 would not cover epochs 1-9).
    flow.train(data, epochs=1, clip_len=4, save_every=10, save_every_steps=2)
    assert os.path.isdir("checkpoints/step_2")
    assert not os.path.isdir("checkpoints/step_1")
    # A clean shutdown also writes the final state (step_3); this test
    # simulates PREEMPTION mid-epoch, so discard it and resume from the
    # step-cadence checkpoint.
    import shutil

    shutil.rmtree("checkpoints/step_3")

    # "Preempted": resume from the latest (after batch 2 of epoch 1).
    data2 = clippack.ClipPackDataset(
        pack, batch_size=4, seed=1, prefer_native=False
    )
    flow2 = VideoFlow(model, cfg=cfg, image_size=32)
    start = flow2.resume(clip_len=4, data=data2)
    assert start == 0  # re-enter the partial epoch
    assert data2.position() == {"epoch": 0, "batch": 2}

    flow2.train(data2, epochs=2, clip_len=4, start_epoch=start,
                save_every=10, save_every_steps=2)
    # Epoch 1 served ONLY its remaining batch; epoch 2 served all 3.
    assert int(flow2.state.step) == 4
    assert data2.position() == {"epoch": 2, "batch": 0}
    # Step-granular tags stay globally monotone across the resume: the
    # epoch-2 cadence save lands at global batch (2-1)*3 + 2 = 5, and the
    # clean shutdown adds the final state at 2*3 = 6.
    from tchvp_tpu.train import checkpoint as ckpt_lib

    assert ckpt_lib.latest_step_dir("checkpoints").endswith("step_6")
    assert os.path.isdir("checkpoints/step_5")
    # Preempt again: drop the clean-shutdown save to resume mid-epoch.
    shutil.rmtree("checkpoints/step_6")

    # Boundary case: a cadence that lands on the epoch's final batch
    # still saves (save_every=10 would otherwise skip epochs 1-9), and
    # its position records the NEXT epoch's start.
    data3 = clippack.ClipPackDataset(
        pack, batch_size=4, seed=1, prefer_native=False
    )
    flow3 = VideoFlow(model, cfg=cfg, image_size=32)
    start3 = flow3.resume(clip_len=4, data=data3)
    assert start3 == 1  # step_5 was mid-epoch-2 (data epoch 1, batch 2)
    assert data3.position() == {"epoch": 1, "batch": 2}
    flow3.train(data3, epochs=2, clip_len=4, start_epoch=start3,
                save_every=10, save_every_steps=3)
    # Epoch 2's remainder was 1 batch (abs 3): boundary save tag 6.
    assert ckpt_lib.latest_step_dir("checkpoints").endswith("step_6")
    data4 = clippack.ClipPackDataset(
        pack, batch_size=4, seed=1, prefer_native=False
    )
    flow4 = VideoFlow(model, cfg=cfg, image_size=32)
    start4 = flow4.resume(clip_len=4, data=data4)
    assert start4 == 2  # boundary: continue at the NEXT epoch...
    assert data4.position() == {"epoch": 2, "batch": 0}  # ...of the STREAM

    # Tag schemes must not mix in one directory: a resumed run that
    # drops --save-every-steps would tag below the existing maximum.
    with pytest.raises(ValueError, match="tag scheme"):
        flow4.train(data4, epochs=3, clip_len=4, start_epoch=start4,
                    save_every=10)


def test_video_flow_training_is_deterministic(workdir, tmp_path):
    """Two independent flows with the same seed and data produce
    BIT-identical parameters and optimizer moments — pins the
    end-to-end seeding discipline (param init, dropout streams, data
    shuffles). Any ambient nondeterminism (time-seeded rngs, host rng
    leaks into the step, unordered iteration into jit) fails this."""
    from tchvp_tpu.data import clippack
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.train.loops import VideoFlow

    rng = np.random.default_rng(3)
    pack = str(tmp_path / "c.cpk")
    clippack.pack_clips(
        pack, rng.integers(0, 256, (8, 2, 32, 32, 3), dtype=np.uint8)
    )
    cfg_m = VideoModelConfig(
        temporal=TransformerConfig(
            input_dim=64, hidden_dim=32, num_layers=1, num_heads=4,
            dropout_rate=0.1,  # nonzero: the dropout stream is pinned too
        )
    )

    def run(tag):
        flow = VideoFlow(
            VideoHybridNet(config=cfg_m),
            cfg=TrainConfig(model_name=f"det_{tag}", loss="mse", lr=1e-3,
                            checkpoint_dir=str(tmp_path / f"ck_{tag}")),
            image_size=32,
        )
        data = clippack.ClipPackDataset(
            pack, batch_size=4, seed=7, prefer_native=False
        )
        flow.train(data, epochs=2, clip_len=2, save_every=100)
        return flow.state

    import jax

    a, b = run("a"), run("b")
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(
        jax.tree.leaves(a.opt_state), jax.tree.leaves(b.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip(workdir):
    import jax

    from tchvp_tpu.train import checkpoint as ckpt

    params = {"layer": {"kernel": np.arange(6.0).reshape(2, 3)}}
    path = ckpt.save_state("ck", 7, params, extra={"loss": [1.0, 0.5]})
    restored = ckpt.restore_state(path)
    assert restored["step"] == 7
    np.testing.assert_array_equal(
        restored["params"]["layer"]["kernel"], params["layer"]["kernel"]
    )
    # Subtree restore (transfer interface).
    sub = ckpt.restore_subtree(path, ("layer",))
    assert "kernel" in sub["layer"]


def test_summary_writer_tfevents_format(workdir):
    """The event file must carry valid TFRecord framing + our scalars."""
    import struct

    from tchvp_tpu.train.logging import SummaryWriter, _crc32c

    w = SummaryWriter("logs")
    w.add_scalar("Training Loss", 0.5, 1)
    w.add_scalar("Training Loss", 0.25, 2)
    w.close()

    path = glob.glob("logs/events.out.tfevents.*")[0]
    raw = open(path, "rb").read()
    records = []
    off = 0
    while off < len(raw):
        (length,) = struct.unpack_from("<Q", raw, off)
        payload = raw[off + 12 : off + 12 + length]
        records.append(payload)
        off += 12 + length + 4
    assert len(records) == 3  # version event + 2 scalars
    assert b"brain.Event:2" in records[0]
    assert b"Training Loss" in records[1]
    # Known CRC32C test vector: crc32c(b"123456789") == 0xE3069283.
    assert _crc32c(b"123456789") == 0xE3069283


def test_video_step_remat_matches_no_remat():
    """jax.checkpoint must not change numerics, only memory."""
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
    batch = np.random.default_rng(0).integers(
        0, 255, (2, 2, size, size, 3), dtype=np.uint8
    )

    def run(**kw):
        state = create_train_state(
            model,
            jnp.zeros((2, 2, size, size, 3)),
            make_optimizer(1e-3),
            jax.random.PRNGKey(0),
        )
        step = make_video_train_step(size, loss="mse", **kw)
        state, m = step(state, jnp.asarray(batch))
        return float(m["loss"]), jax.tree.leaves(
            jax.tree.map(np.asarray, state.params)
        )[0]

    l0, p0 = run(remat=False)
    # Every remat policy recomputes differently but must not change the
    # math: legacy remat=True (== "full"), stage-boundary, and dots.
    for kw in (
        dict(remat=True),
        dict(remat_policy="stages"),
        dict(remat_policy="dots"),
    ):
        l1, p1 = run(**kw)
        np.testing.assert_allclose(l0, l1, rtol=1e-6, err_msg=str(kw))
        np.testing.assert_allclose(p0, p1, rtol=1e-5, atol=1e-6, err_msg=str(kw))

    with pytest.raises(ValueError, match="remat_policy"):
        make_video_train_step(size, loss="mse", remat_policy="bogus")


def test_segmentation_restore_resumes_epoch_numbering(tmp_path):
    """restore() + train() must continue where the checkpoint left off —
    epoch numbers, best-loss seeding, and the loss-history list (the
    FCT.py:368-373 resume contract) — not replay epoch 1."""
    from tchvp_tpu.config import FCTConfig, TrainConfig
    from tchvp_tpu.models import FCT
    from tchvp_tpu.train.loops import SegmentationFlow

    def mk():
        return SegmentationFlow(
            model=FCT(config=FCTConfig(filters=(2, 2, 2, 2, 2, 2, 2, 2, 2),
                                       attn_impl="xla")),
            cfg=TrainConfig(
                model_name="seg_resume", loss="dice", lr=1e-3,
                checkpoint_dir=str(tmp_path / "ck"),
                sample_dir=str(tmp_path / "samples"),
                log_dir=str(tmp_path / "logs"),
            ),
            image_size=32,
        )

    rng = np.random.default_rng(0)
    data = [
        (rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8),
         rng.integers(0, 255, (2, 32, 32, 1), dtype=np.uint8))
    ]
    flow = mk()
    flow.train(data, epochs=2)
    assert flow.loss_history and len(flow.loss_history) == 2

    resumed = mk()
    import tchvp_tpu.train.checkpoint as ckpt

    resumed.restore(ckpt.latest_step_dir(str(tmp_path / "ck")))
    assert resumed.start_epoch == 2
    assert len(resumed.loss_history) == 2
    resumed.train(data, epochs=3)  # continues: exactly ONE more epoch
    assert len(resumed.loss_history) == 3


def test_cli_infer_smoke(workdir, capsys):
    """`tchvp infer` end-to-end: synthetic clips -> PSNR + frame dumps."""
    from tchvp_tpu.cli import main

    out = str(workdir / "infer_out")
    main([
        "infer", "--synthetic", "2", "--image-size", "32", "--batch-size",
        "2", "--clip-len", "4", "--microbatch", "1", "--out-dir", out,
    ])
    text = capsys.readouterr().out
    assert "mean PSNR" in text
    assert len(os.listdir(out)) == 4  # one panel per frame of clip 0
