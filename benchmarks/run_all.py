#!/usr/bin/env python
"""Benchmark suite: the five BASELINE.md measured configs.

Writes one JSON line per config to stdout and (with --out) a markdown
table to BENCHES.md. ``bench.py`` at the repo root remains the single
headline-number driver; this suite is the full perf surface.

Configs (BASELINE.md):
  0. Batch-1 CPU inference, 8-frame 128x128 clip, fp32.
  1. 16-frame 224x224 clips, batch 8, bf16, fused preprocessing (headline).
  2. 32-frame 384x384 clips, windowed Pallas flash attention. Batch is the
     largest that fits one v5e chip (16 in BASELINE assumes a pod slice;
     single-chip HBM caps the decoder activations).
  3. Full training step (fwd/bwd + reconstruction loss), data-parallel
     mesh over all local devices (1 on the tunnel, 8 on a v4-8).
  4. Streaming path: high-res frames tiled to patches, chunked temporal
     attention with carried context.

Usage:
  python benchmarks/run_all.py               # all configs
  python benchmarks/run_all.py 1 4           # subset
  python benchmarks/run_all.py --out BENCHES.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out) -> float:
    """Force a real device sync via a scalar host readback.

    On the axon tunnel ``block_until_ready`` returns before device work
    drains (see bench.py's in-jit loop workaround); reading one element
    back is the reliable fence.
    """
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def _time_loop(fn, *args, reps: int = 3, inner: int = 1):
    """Compile, then median wall time of ``reps`` calls / ``inner`` iters."""
    _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


def _emit(result: dict, results: list):
    print(json.dumps(result), flush=True)
    results.append(result)


def config0(results):
    """Batch-1 CPU fp32: 8-frame 128^2 through the full pipeline."""
    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.models import VideoHybridNet

    cpu = jax.devices("cpu")[0]
    cfg = flagship_video_config(image_size=128)
    model = VideoHybridNet(config=cfg)  # fp32
    clip = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 8, 128, 128, 3)).astype(np.float32)
    )
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0), clip)
        fn = jax.jit(lambda c: model.apply(variables, c)[1], device=cpu)
        t = _time_loop(fn, clip)
    _emit({
        "config": 0,
        "metric": "CPU fp32 batch-1 8f 128px inference",
        "frames_per_s": round(8 / t, 2),
        "p50_clip_latency_ms": round(t * 1000, 1),
        "device": "cpu",
    }, results)


def _flagship(size, frames, batch, attn="xla", window=0, dtype=jnp.bfloat16,
              microbatch=None):
    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.data.pipeline import preprocess_clip
    from tchvp_tpu.models import VideoHybridNet, microbatched_infer

    cfg = flagship_video_config(image_size=size, attn_impl=attn, window_size=window)
    model = VideoHybridNet(config=cfg, dtype=dtype)
    raw = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (batch, frames, size, size, 3), dtype=np.uint8
        )
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, size, size, 3)))

    # Microbatched configs: the batch already takes ~0.7 s, so host-side
    # timing is accurate with a single in-jit iteration — and a 10-deep
    # fori_loop over the lax.map body crashes the remote TPU compiler.
    iters = 1 if microbatch else 10

    @jax.jit
    def loop(variables, raw):
        clip = preprocess_clip(raw, size, dtype=dtype)

        def body(i, acc):
            x = clip + i * jnp.asarray(1e-6, dtype)
            if microbatch:
                recon = microbatched_infer(model, variables, x, microbatch)
            else:
                _, recon = model.apply(variables, x)
            return acc + recon.mean().astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t = _time_loop(loop, variables, raw, inner=iters)
    return t, batch * frames


def config1(results):
    t, fpb = _flagship(224, 16, 8)
    _emit({
        "config": 1,
        "metric": "16f 224px batch-8 bf16 inference, fused preprocessing",
        "frames_per_s_per_chip": round(fpb / t, 1),
        "vs_2000fps_target": round(fpb / t / 2000.0, 3),
        "device": str(jax.devices()[0]),
    }, results)


def config2(results, batch=16, microbatch=4):
    """BASELINE spec batch 16 on ONE chip: clips are independent, so
    ``microbatched_infer`` runs the batch as lax.map groups — peak
    activation memory is one group's (batch-16 monolithic would need
    ~29 GB of decoder activations > 16 GB HBM)."""
    t, fpb = _flagship(384, 32, batch, attn="flash", window=64,
                       microbatch=microbatch)
    _emit({
        "config": 2,
        "metric": (f"32f 384px batch-{batch} windowed Pallas flash attention"
                   + (f", microbatch {microbatch}" if microbatch else "")),
        "frames_per_s_per_chip": round(fpb / t, 1),
        "p50_batch_latency_ms": round(t * 1000, 2),
        "device": str(jax.devices()[0]),
    }, results)


def config3(results, batch=None):
    """Full training step, data-parallel over all local devices.

    BASELINE's batch 32 over a v4-8's 4 chips = 8 clips/chip; batch
    scales with the local device count so the per-chip working set is
    constant.
    """
    from benchmarks import _config3
    from tchvp_tpu.parallel import make_mesh, replicate, shard_batch
    from tchvp_tpu.train.steps import make_video_train_step

    size, frames = 224, 16
    n_dev = len(jax.devices())
    if batch is None:
        # BASELINE batch 32 over a v4-8 (4 chips, megacore) = 8 clips/chip.
        # Measured on v5e (benchmarks/remat_sweep.py): batch 8 fits in HBM
        # WITHOUT remat (XLA schedules around the pressure; temp 13.5 GB)
        # and is 13% faster per frame than 4/chip — 454.7 vs 400.8 f/s.
        batch = 8 * n_dev
    model = _config3.build_model(size)
    state = _config3.make_state(model, size)
    raw = _config3.make_batch(batch, frames, size)
    # No remat: every policy measured slower at these shapes (remat_sweep:
    # 21% at batch 4) and XLA fits batch 8 on its own; remat_policy stays
    # the lever for batches past the HBM knee (see BENCHES.md).
    step = make_video_train_step(size, loss="mse", remat=False)
    mesh = make_mesh(("data",))
    with mesh:
        state = replicate(state, mesh)
        sharded = shard_batch(jnp.asarray(raw), mesh)
        t, state = _config3.time_train_step(step, state, sharded)
    _emit({
        "config": 3,
        "metric": f"train step (fwd/bwd, mse) batch-{batch} 16f 224px, dp x{n_dev}",
        "frames_per_s": round(batch * frames / t, 1),
        "step_ms": round(t * 1000, 1),
        "devices": n_dev,
    }, results)


def config4(results, resolutions=((1080, 1920), (720, 1280))):
    """Streaming: high-res frames tiled to 256px patches, chunked scan.

    BASELINE configs[4] specifies 1080p; 720p is kept as a secondary
    point. 1080p pads to 1152x2048 = 8x5 tiles of 256 after edge-pad."""
    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.models import StreamingConfig, VideoHybridNet, stream_video

    tile, frames = 256, 16
    cfg = flagship_video_config(image_size=tile)
    model = VideoHybridNet(config=cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, tile, tile, 3)))
    # chunk 8 measured ~25% faster than chunk 4 (fewer scan steps); the
    # carried context is nearly free.
    scfg = StreamingConfig(tile=tile, chunk_len=8, ctx_frames=4)
    for h, w in resolutions:
        clip = jnp.asarray(
            np.random.default_rng(0)
            .uniform(size=(1, frames, h, w, 3))
            .astype(np.float32)
        )
        # variables as a jit ARG: closure capture would bake the params
        # into the program as constants (huge HLO, tunnel request-size
        # blowup).
        fn = jax.jit(lambda v, c: stream_video(model, v, c, scfg))
        t = _time_loop(fn, variables, clip)
        _emit({
            "config": 4,
            "metric": f"streaming {h}p {frames}f: 256px tiles, chunked ctx attention",
            "frames_per_s": round(frames / t, 2),
            "megapixels_per_s": round(frames * h * w / t / 1e6, 1),
            "device": str(jax.devices()[0]),
        }, results)


def main():
    from tchvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    which = set(args.configs) if args.configs else {0, 1, 2, 3, 4}

    results: list = []
    runners = {0: config0, 1: config1, 2: config2, 3: config3, 4: config4}
    for i in sorted(which):
        try:
            runners[i](results)
        except Exception as e:  # keep the suite going; record the failure
            _emit({"config": i, "error": f"{type(e).__name__}: {e}"[:300]}, results)

    if args.out:
        lines = ["# BENCHES — measured on " + str(jax.devices()[0]), ""]
        lines.append("| config | metric | result |")
        lines.append("|---|---|---|")
        for r in results:
            metric = r.get("metric", "—")
            rest = {k: v for k, v in r.items() if k not in ("config", "metric")}
            lines.append(f"| {r['config']} | {metric} | `{json.dumps(rest)}` |")
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
