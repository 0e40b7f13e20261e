"""`tchvp eval` — standalone checkpoint evaluation (the reference's
validate/test loops, Model.py:75-135, surfaced as a first-class command)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tchvp_tpu.cli import main
from tchvp_tpu.train import checkpoint as ckpt


def _tiny_ae_state(size=64):
    from tchvp_tpu.train.loops import DenoisingFlow

    flow = DenoisingFlow(image_size=size)
    return flow.init_state()


def test_eval_restores_full_state_checkpoint(tmp_path, capsys):
    state = _tiny_ae_state()
    path = ckpt.save_state(
        str(tmp_path), 3, state.params, state.opt_state, state.batch_stats
    )
    main([
        "eval", "--model", "ae", "--synthetic", "1", "--batch-size", "2",
        "--image-size", "64", "--checkpoint", path,
    ])
    out = capsys.readouterr().out
    assert "eval ae: reconstruction PSNR" in out
    assert f"ckpt {path}" in out


def test_eval_restores_weights_only_checkpoint(tmp_path, capsys):
    state = _tiny_ae_state()
    path = ckpt.save_params(str(tmp_path), "IMAGE2IMAGE", state.params)
    main([
        "eval", "--model", "ae", "--synthetic", "1", "--batch-size", "2",
        "--image-size", "64", "--checkpoint", path,
    ])
    out = capsys.readouterr().out
    assert "eval ae: reconstruction PSNR" in out


def test_eval_picks_latest_step_dir(tmp_path, capsys):
    state = _tiny_ae_state()
    ckpt.save_state(str(tmp_path), 1, state.params)
    newest = ckpt.save_state(str(tmp_path), 7, state.params)
    main([
        "eval", "--model", "ae", "--synthetic", "1", "--batch-size", "2",
        "--image-size", "64", "--checkpoint-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert f"ckpt {newest}" in out


def test_eval_mask_metrics_supervised(capsys):
    main([
        "eval", "--model", "unet", "--synthetic", "1", "--batch-size", "2",
        "--image-size", "64",
    ])
    out = capsys.readouterr().out
    assert "dice" in out and "iou" in out


def test_eval_rejects_mismatched_checkpoint(tmp_path):
    """A checkpoint from a different model must fail loudly, not load
    garbage (the _retype extra-keys / shape checks)."""
    from tchvp_tpu.models import UNet
    from tchvp_tpu.train import create_train_state, make_optimizer

    unet_state = create_train_state(
        UNet(), jnp.zeros((1, 64, 64, 3)), make_optimizer(1e-3),
        jax.random.PRNGKey(0),
    )
    path = ckpt.save_state(str(tmp_path), 1, unet_state.params)
    with pytest.raises(ValueError):
        main([
            "eval", "--model", "ae", "--synthetic", "1", "--batch-size", "2",
            "--image-size", "64", "--checkpoint", path,
        ])


def test_eval_checkpoint_from_differently_flagged_optimizer(tmp_path, capsys):
    """Eval must load checkpoints regardless of the TRAINING optimizer's
    flags: a --schedule/--ema-decay/NaN-guard chain stores an opt_state
    whose structure eval's default template can't retype — round 3's chip
    drive crashed here. Eval now loads only params (+ batch stats);
    --ema evaluates the carried EMA average instead."""
    from tchvp_tpu.models import AutoEncoder
    from tchvp_tpu.train import create_train_state, make_optimizer

    size = 64
    model = AutoEncoder()
    state = create_train_state(
        model,
        jnp.zeros((1, size, size, 3)),
        make_optimizer(
            1e-3, schedule="cosine", warmup_steps=2, total_steps=8,
            ema_decay=0.9, skip_nonfinite_updates=2, grad_clip_norm=1.0,
        ),
        jax.random.PRNGKey(0),
    )
    path = ckpt.save_state(
        str(tmp_path), 5, state.params, state.opt_state, state.batch_stats
    )
    main([
        "eval", "--model", "ae", "--synthetic", "1", "--batch-size", "2",
        "--image-size", "64", "--checkpoint", path,
    ])
    out = capsys.readouterr().out
    assert "eval ae: reconstruction PSNR" in out

    # --ema evaluates the EMA average carried in the optimizer state.
    main([
        "eval", "--model", "ae", "--synthetic", "1", "--batch-size", "2",
        "--image-size", "64", "--checkpoint", path, "--ema",
    ])
    out = capsys.readouterr().out
    assert "eval ae: reconstruction PSNR" in out

    # --ema on a checkpoint without EMA state exits with a clear message.
    state2 = create_train_state(
        model, jnp.zeros((1, size, size, 3)), make_optimizer(1e-3),
        jax.random.PRNGKey(0),
    )
    path2 = ckpt.save_state(
        str(tmp_path / "plain"), 5, state2.params, state2.opt_state,
        state2.batch_stats,
    )
    with pytest.raises(SystemExit, match="no EMA state"):
        main([
            "eval", "--model", "ae", "--synthetic", "1", "--batch-size", "2",
            "--image-size", "64", "--checkpoint", path2, "--ema",
        ])


def test_eval_int8_serving_mode(capsys):
    """`eval --int8`: serving-mode PSNR over synthetic clips (fresh
    params — the plumbing, calibration, and interception are the test)."""
    main([
        "eval", "--model", "hybrid", "--synthetic", "1", "--batch-size", "2",
        "--image-size", "32", "--clip-len", "2", "--int8",
    ])
    out = capsys.readouterr().out
    assert "eval hybrid [int8 serving]: reconstruction PSNR" in out


def test_eval_int8_rejects_non_video_models():
    with pytest.raises(SystemExit, match="int8"):
        main([
            "eval", "--model", "fct", "--synthetic", "1", "--batch-size", "1",
            "--image-size", "32", "--int8",
        ])
