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


from benchmarks._timing import timeit as _timeit


def timeit(fn, *args, iters=20):
    """ms/call via the shared in-jit loop recipe (benchmarks/_timing.py);
    only the first arg (the image batch) is perturbed — the rest are
    weights/qparams whose calibrated values must stay exact."""
    ms, _ = _timeit(fn, *args, iters=iters, perturb=1, verbose=True)
    return ms


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
