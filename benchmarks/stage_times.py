#!/usr/bin/env python
"""Per-stage timing of the flagship pipeline at the headline config.

Times encoder / temporal / decoder separately (same in-jit fori_loop +
scalar-readback discipline as bench.py) and prints each stage's share,
plus an XLA cost-analysis FLOP/byte estimate per stage — the data that
decides where MFU work goes (VERDICT r1 "next" #4).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/stage_times.py

BENCH_TRAIN=1 (round-5, verdict #2): the TRAINING roofline — fwd+bwd
per stage of the BASELINE config-3 model (hidden-2048 temporal, batch 8
x 16f x 224² per chip), plus the fwd-only stage for the bwd/fwd ratio
and the full train step (config-3 recipe) for cross-check. Each stage's
"bwd" entry is grad-of-sum w.r.t. params (and the stage input for the
interior stages — dx flows in the real backward). This is the
measurement the round-4 verdict flagged as missing: the 30%-MFU train
step was never decomposed. Results -> BENCHES.md training-roofline
table.
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


def _grad_readback(g):
    """One scalar touching EVERY grad leaf, so no leaf's computation is
    dead inside the timing loop (a single-leaf readback would let XLA
    DCE the rest)."""
    return sum(jnp.ravel(l)[0].astype(jnp.float32) for l in jax.tree.leaves(g))


def timed_grad(fn, *args, iters=ITERS):
    """Median s/iter of an in-jit loop over a grad-producing fn (returns
    a pytree; readback keeps every leaf live)."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            g = fn(*a, jnp.asarray(i, jnp.int32))
            return acc + _grad_readback(g)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    _ = float(loop(*args))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        reps.append((time.perf_counter() - t0) / iters)
    return float(np.median(reps))


def main_train():
    """Training roofline: per-stage fwd+bwd of the config-3 model."""
    from benchmarks import _config3
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    size = SIZE
    model = _config3.build_model(size)
    rng = np.random.default_rng(0)
    clip = jnp.asarray(
        rng.uniform(size=(BATCH, FRAMES, size, size, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, size, size, 3))
    )
    tokens, hw = model.apply(
        variables, clip, method=VideoHybridNet.encode_clip
    )
    mixed = model.apply(variables, tokens, method=VideoHybridNet.temporal_mix)

    # Per-stage scalar losses. Interior stages differentiate w.r.t.
    # (params, stage input) — the real backward propagates dx through
    # them; the encoder w.r.t. params only (dx of the raw clip is never
    # needed).
    def enc_loss(v, c):
        t, _ = model.apply(v, c, method=VideoHybridNet.encode_clip)
        return jnp.sum(t.astype(jnp.float32))

    def mix_loss(v, t):
        return jnp.sum(
            model.apply(v, t, method=VideoHybridNet.temporal_mix)
            .astype(jnp.float32)
        )

    def dec_loss(v, t):
        return jnp.sum(
            model.apply(v, t, hw, method=VideoHybridNet.decode_tokens)
            .astype(jnp.float32)
        )

    def full_loss(v, c):
        _, r = model.apply(v, c)
        return jnp.mean((r.astype(jnp.float32) - c.astype(jnp.float32)) ** 2)

    stages = {
        "encoder": (enc_loss, (variables, clip), (0,)),
        "temporal": (mix_loss, (variables, tokens), (0, 1)),
        "decoder": (dec_loss, (variables, mixed), (0, 1)),
        "full_fwd_bwd": (full_loss, (variables, clip), (0,)),
    }
    peak_tflops = 197.0 if jax.default_backend() == "tpu" else None
    out = {}
    for name, (loss_fn, args, argnums) in stages.items():
        gfn = jax.grad(loss_fn, argnums=argnums)

        def bwd(*a, _g=gfn, _n=len(args)):
            *real, i = a
            # Perturb the LAST array arg by the loop index so XLA can't
            # hoist the grad out of the timing loop.
            real = list(real)
            real[-1] = real[-1] + i.astype(real[-1].dtype) * 1e-6
            return _g(*real)

        t = timed_grad(bwd, *args)
        gflop, gb = cost(lambda *a, _g=gfn: _g(*a), *args)
        row = {
            "ms": round(t * 1000, 2),
            "GFLOP": round(gflop, 1),
            "GB": round(gb, 2),
            "TFLOPs": round(gflop / t / 1000, 1),
            "GBps": round(gb / t, 0),
        }
        if peak_tflops:
            row["MFU_pct"] = round(100 * gflop / t / 1000 / peak_tflops, 1)
        out[name] = row
        print(json.dumps({name: row}), flush=True)

    # Cross-check: the real config-3 train step (fwd+bwd+optimizer).
    state = _config3.make_state(model, size)
    from tchvp_tpu.train.steps import make_video_train_step

    step = make_video_train_step(size, loss="mse")
    raw = _config3.make_batch(BATCH, FRAMES, size)
    t_step, _ = _config3.time_train_step(step, state, jnp.asarray(raw))
    covered = sum(out[s]["ms"] for s in ("encoder", "temporal", "decoder"))
    print(json.dumps({
        "stage_bwd_sum_ms": round(covered, 2),
        "full_fwd_bwd_ms": out["full_fwd_bwd"]["ms"],
        "train_step_ms": round(t_step * 1000, 2),
        "frames_per_s_train": round(BATCH * FRAMES / t_step, 1),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_TRAIN") == "1":
        main_train()
    else:
        main()
