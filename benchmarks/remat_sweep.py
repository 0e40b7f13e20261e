"""Remat-policy sweep at the BASELINE config-3 operating point.

For each rematerialization policy of the video train step
(``make_video_train_step(remat_policy=...)``) this measures, on the real
chip: step time, frames/s, and the compiled peak/temp HBM footprint
(``compiled.memory_analysis()``) — the data behind choosing a policy for
bigger per-chip batches. Run:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/remat_sweep.py \
        [--batch 4] [--policies none,stages,full,dots] [--try-batches 4,8,12]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from tchvp_tpu.utils.cache import enable_compilation_cache


def build(size=224):
    from tchvp_tpu.config import ResNetAEConfig, TransformerConfig, VideoModelConfig
    from tchvp_tpu.models import VideoHybridNet

    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(token_latent=True),
        temporal=TransformerConfig(
            input_dim=(size // 4) ** 2, hidden_dim=2048, num_layers=2, num_heads=8
        ),
    )
    return VideoHybridNet(config=cfg, dtype=jnp.bfloat16)


def measure(model, policy: str, batch: int, size=224, frames=16):
    from tchvp_tpu.train import create_train_state, make_optimizer
    from tchvp_tpu.train.steps import make_video_train_step

    state = create_train_state(
        model,
        jnp.zeros((1, 2, size, size, 3)),
        make_optimizer(1e-4, grad_clip_norm=1.0),
        jax.random.PRNGKey(0),
    )
    raw = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (batch, frames, size, size, 3), dtype=np.uint8
        )
    )
    step = make_video_train_step(size, loss="mse", remat_policy=policy)
    mem = {}
    try:
        ma = step.lower(state, raw).compile().memory_analysis()
        if ma is not None:
            mem = {
                "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
                "arg_gb": round(ma.argument_size_in_bytes / 2**30, 2),
                "peak_gb": round(
                    (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                     + ma.output_size_in_bytes) / 2**30, 2),
            }
    except Exception as e:  # memory_analysis unsupported on some backends
        mem = {"memory_analysis": f"unavailable: {type(e).__name__}"}

    t0 = time.perf_counter()
    state, m = step(state, raw)
    _ = float(m["loss"])  # real sync (axon block_until_ready lies)
    compile_s = time.perf_counter() - t0
    times = []
    inner = 5
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(inner):
            state, m = step(state, raw)
        _ = float(m["loss"])
        times.append((time.perf_counter() - t0) / inner)
    t = float(np.median(times))
    return {
        "policy": policy,
        "batch": batch,
        "step_ms": round(t * 1e3, 1),
        "frames_per_s": round(batch * frames / t, 1),
        "compile_s": round(compile_s, 1),
        **mem,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--policies", default="none,stages,dots,full")
    ap.add_argument("--try-batches", default="",
                    help="extra comma-separated batch sizes to probe per "
                         "policy (OOMs are reported, not fatal)")
    args = ap.parse_args()

    enable_compilation_cache()
    print(f"devices: {jax.devices()}")
    model = build()
    for policy in args.policies.split(","):
        batches = [args.batch] + [
            int(b) for b in args.try_batches.split(",") if b
        ]
        for b in batches:
            try:
                print(measure(model, policy, b), flush=True)
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                print({"policy": policy, "batch": b,
                       "error": f"{type(e).__name__}: {msg}"}, flush=True)


if __name__ == "__main__":
    main()
