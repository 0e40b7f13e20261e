#!/usr/bin/env python
"""QAT vs plain training: int8 serving fidelity, measured on the chip.

Trains the flagship VideoHybridNet twice from the SAME init on the same
deterministic clip stream — once plain, once with quantization-aware
training (`train/qat.py`) — then serves both checkpoints through the
UNCHANGED int8 PTQ engine (`infer/quant.py`) and measures:

* bf16 PSNR to the clean clips (task fidelity of the fp checkpoint),
* int8-serving PSNR to the clean clips (what `infer --int8` ships),
* int8-vs-bf16 agreement PSNR (the quantization gap itself).

QAT's claim is that training against the serving engine's arithmetic
(fake-int8 forward, STE gradients) shrinks the int8 gap; this driver
puts a number on it. The reference has no quantization at all
(`requirements.txt:1-12`) — both sides of this comparison are
build-new subsystems.

Env knobs: QAT_SIZE (64), QAT_CLIP (8), QAT_BATCH (8), QAT_EPOCHS (8),
QAT_BATCHES (25 steps/epoch), QAT_DENSE (0).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run_variant(qat: bool, size, clip, batch, epochs, nbatches, dense):
    from tchvp_tpu.config import TrainConfig, flagship_video_config
    from tchvp_tpu.data.pipeline import preprocess_clip
    from tchvp_tpu.data.synthetic import SyntheticClips
    from tchvp_tpu.infer import Int8Engine
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.train.loops import VideoFlow
    from tchvp_tpu import losses as losses_lib

    tag = "qat" if qat else "plain"
    data = SyntheticClips(batch, clip, size, nbatches, seed=0)
    with tempfile.TemporaryDirectory() as ckdir:
        # mse: MixedLoss's 5-scale MS-SSIM needs >=160px spatial dims,
        # and the quantization comparison is loss-agnostic anyway.
        cfg = TrainConfig(model_name=f"QATFID_{tag}", loss="mse",
                          checkpoint_dir=ckdir, seed=0)
        flow = VideoFlow(
            VideoHybridNet(config=flagship_video_config(size)),
            cfg=cfg, image_size=size, qat=qat, qat_dense=dense,
        )
        flow.train(data, epochs=epochs, clip_len=clip, save_every=epochs)
    params = flow.state.params
    variables = {"params": params, **(
        {"batch_stats": flow.state.batch_stats}
        if flow.state.batch_stats is not None else {}
    )}
    model = flow.model

    eval_data = [jnp.asarray(b) for b in
                 SyntheticClips(batch, clip, size, 4, seed=99)]
    eng = Int8Engine(model, variables, quantize_dense=dense)
    eng.calibrate([preprocess_clip(eval_data[0], size)])

    def metrics(qparams, variables, batch):
        clean = preprocess_clip(batch, size)
        _, bf16 = model.apply(variables, clean, deterministic=True)
        with eng.intercepting(qparams):
            _, q = model.apply(variables, clean, deterministic=True)
        return (losses_lib.psnr(bf16, clean), losses_lib.psnr(q, clean),
                losses_lib.psnr(q, bf16))

    fn = jax.jit(metrics)
    acc = [0.0, 0.0, 0.0]
    for b in eval_data:
        vals = fn(eng.qparams, variables, b)
        for i, v in enumerate(vals):
            acc[i] += float(v) / len(eval_data)
    row = {"variant": tag, "bf16_psnr": round(acc[0], 2),
           "int8_psnr": round(acc[1], 2), "int8_vs_bf16": round(acc[2], 2)}
    print(json.dumps(row))
    return row


def main():
    from tchvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    size = int(os.environ.get("QAT_SIZE", "64"))
    clip = int(os.environ.get("QAT_CLIP", "8"))
    batch = int(os.environ.get("QAT_BATCH", "8"))
    epochs = int(os.environ.get("QAT_EPOCHS", "8"))
    nbatches = int(os.environ.get("QAT_BATCHES", "25"))
    dense = os.environ.get("QAT_DENSE", "0") == "1"
    print(f"# {jax.devices()[0].device_kind}; {size}px x {clip}f batch "
          f"{batch}, {epochs}x{nbatches} steps, dense={dense}")
    plain = run_variant(False, size, clip, batch, epochs, nbatches, dense)
    qat = run_variant(True, size, clip, batch, epochs, nbatches, dense)
    gap_plain = plain["bf16_psnr"] - plain["int8_psnr"]
    gap_qat = qat["bf16_psnr"] - qat["int8_psnr"]
    print(json.dumps({
        "int8_gap_plain_db": round(gap_plain, 2),
        "int8_gap_qat_db": round(gap_qat, 2),
        "qat_int8_psnr_delta_db": round(qat["int8_psnr"] - plain["int8_psnr"], 2),
    }))


if __name__ == "__main__":
    main()
