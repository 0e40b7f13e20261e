#!/usr/bin/env python
"""FCT-256 int8 boundary, revisited with Dense quantization (VERDICT r2
next-round #6).

Round 2 measured conv-only int8 at 0.96x on FCT-256 and attributed the
loss to the model being dominated by bf16 attention around narrow convs.
The untried lever: quantizing the `nn.Dense` q/k/v/out projections inside
every block's attention. This driver measures bf16 vs int8(convs) vs
int8(convs+dense) ms/fwd and PSNR on the chip, same 256 d batch-2 shape
as the round-2 row.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    """ms/call via an in-jit fori_loop + ONE scalar readback (the
    tunneled chip's block_until_ready is async-ish; see bench.py)."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            first = a[0]
            rest = a[1:]
            out = fn(first + i * jnp.asarray(1e-6, first.dtype), *rest)
            return acc + out.astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(loop(*args))  # compile + warm
    print(f"  [compile+first {time.perf_counter() - t0:.1f}s]", flush=True)
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from tchvp_tpu.config import FCTConfig
    from tchvp_tpu.infer import Int8Engine
    from tchvp_tpu.models import FCT
    from tchvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    size = int(os.environ.get("FCT_SIZE", "256"))
    batch = int(os.environ.get("FCT_BATCH", "2"))
    model = FCT(config=FCTConfig(), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(batch, size, size, 3)), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))

    # timeit perturbs its FIRST argument per iteration — keep that the
    # data tensor, params ride behind.
    fwd = lambda t, v: model.apply(v, t)  # noqa: E731
    ms_bf16 = timeit(fwd, x, variables)
    print(f"FCT-{size} batch {batch} bf16: {ms_bf16:.1f} ms/fwd")

    for dense in (False, True):
        eng = Int8Engine(
            model, variables, quantize_dense=dense
        ).calibrate([x])
        run = lambda t, qp, v: eng.apply(qp, t, variables=v)  # noqa: E731
        ms = timeit(run, x, eng.qparams, variables)
        psnr = eng.psnr_vs(x)
        tag = "convs+dense" if dense else "convs only "
        print(
            f"FCT-{size} int8 {tag}: {ms:.1f} ms/fwd "
            f"({ms_bf16 / ms:.2f}x vs bf16), {len(eng.qparams)} layers, "
            f"{psnr:.1f} dB"
        )


if __name__ == "__main__":
    main()
