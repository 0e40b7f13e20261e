#!/usr/bin/env python
"""FCT-256 batch-2 bf16 forward on the chip — the end-to-end number the
flash block-shape sweep (`flash_block_sweep.py`, BENCHES.md) feeds into.

Timing per CLAUDE.md: in-jit fori_loop perturbing the input with the
loop index, ONE scalar readback per rep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tchvp_tpu.config import FCTConfig
    from tchvp_tpu.models import FCT
    from tchvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    model = FCT(config=FCTConfig(), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 256, 256, 3)), jnp.bfloat16)
    t0 = time.perf_counter()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    iters = 20

    @jax.jit
    def loop(t, v):
        def body(i, acc):
            out = model.apply(v, t + i * jnp.asarray(1e-6, t.dtype))
            return acc + out.astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(loop(x, variables))
    print(f"compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    for rep in range(3):
        t0 = time.perf_counter()
        float(loop(x, variables))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"FCT-256 batch 2 bf16 rep{rep}: {ms:.2f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
