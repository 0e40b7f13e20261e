#!/usr/bin/env python
"""Per-stage timing of the flagship pipeline at the headline config.

Times encoder / temporal / decoder separately (same in-jit fori_loop +
scalar-readback discipline as bench.py) and prints each stage's share,
plus an XLA cost-analysis FLOP/byte estimate per stage — the data that
decides where MFU work goes (VERDICT r1 "next" #4).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/stage_times.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tchvp_tpu.config import flagship_video_config
from tchvp_tpu.models import VideoHybridNet

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "16"))
SIZE = int(os.environ.get("BENCH_SIZE", "224"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def timed(fn, *args, iters=ITERS):
    """Median seconds per iteration of an in-jit loop."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*a, jnp.asarray(i, jnp.int32))
            return acc + jnp.ravel(out)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    _ = float(loop(*args))  # compile + warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        reps.append((time.perf_counter() - t0) / iters)
    return float(np.median(reps))


def cost(fn, *args):
    """XLA cost analysis: (GFLOP, GB accessed) per call."""
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("flops", 0.0) / 1e9, c.get("bytes accessed", 0.0) / 1e9


def main():
    from tchvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = flagship_video_config(image_size=SIZE)
    model = VideoHybridNet(config=cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    clip = jnp.asarray(
        rng.uniform(size=(BATCH, FRAMES, SIZE, SIZE, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, SIZE, SIZE, 3)))

    tokens, hw = model.apply(variables, clip, method=VideoHybridNet.encode_clip)
    mixed = model.apply(variables, tokens, method=VideoHybridNet.temporal_mix)

    def enc(v, c, i):
        t, _ = model.apply(v, c + i.astype(c.dtype) * 1e-6,
                           method=VideoHybridNet.encode_clip)
        return t

    def mix(v, t, i):
        return model.apply(v, t + i.astype(t.dtype) * 1e-6,
                           method=VideoHybridNet.temporal_mix)

    def dec(v, t, i):
        return model.apply(v, t + i.astype(t.dtype) * 1e-6, hw,
                           method=VideoHybridNet.decode_tokens)

    def full(v, c, i):
        _, r = model.apply(v, c + i.astype(c.dtype) * 1e-6)
        return r

    stages = {
        "encoder": (enc, (variables, clip)),
        "temporal": (mix, (variables, tokens)),
        "decoder": (dec, (variables, mixed)),
        "full": (full, (variables, clip)),
    }
    out = {}
    for name, (fn, args) in stages.items():
        t = timed(fn, *args)
        gflop, gb = cost(lambda *a: fn(*a, jnp.int32(0)), *args)
        out[name] = {
            "ms": round(t * 1000, 2),
            "GFLOP": round(gflop, 1),
            "GB": round(gb, 2),
            "TFLOPs": round(gflop / t / 1000, 1),
            "GBps": round(gb / t, 0),
        }
        print(json.dumps({name: out[name]}), flush=True)
    covered = sum(out[s]["ms"] for s in ("encoder", "temporal", "decoder"))
    print(json.dumps({
        "stage_sum_ms": round(covered, 2),
        "full_ms": out["full"]["ms"],
        "frames_per_s_full": round(BATCH * FRAMES / (out["full"]["ms"] / 1000), 1),
    }))


if __name__ == "__main__":
    main()
