"""Remat-policy sweep at the BASELINE config-3 operating point.

For each rematerialization policy of the video train step
(``make_video_train_step(remat_policy=...)``) this measures, on the real
chip: step time, frames/s, and the compiled peak/temp HBM footprint
(``compiled.memory_analysis()``) — the data behind choosing a policy for
bigger per-chip batches. Model construction and the timing recipe are
shared with run_all.py's config3 via ``benchmarks/_config3.py`` so the
numbers stay cross-comparable with the config-3 headline. Run:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/remat_sweep.py \
        [--batch 4] [--policies none,stages,full,dots] [--try-batches 8,12]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks import _config3
from tchvp_tpu.utils.cache import enable_compilation_cache


def measure(model, policy: str, batch: int, size=224, frames=16):
    from tchvp_tpu.train.steps import make_video_train_step

    state = _config3.make_state(model, size)
    raw = jnp.asarray(_config3.make_batch(batch, frames, size))
    step = make_video_train_step(size, loss="mse", remat_policy=policy)

    # The heavy XLA compile happens HERE (the later step() call re-traces
    # but reuses the executable), so time it as the compile cost.
    t0 = time.perf_counter()
    compiled = step.lower(state, raw).compile()
    compile_s = time.perf_counter() - t0
    mem = {}
    try:
        ma = compiled.memory_analysis()
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

    t, _ = _config3.time_train_step(step, state, raw)
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
    model = _config3.build_model()
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
