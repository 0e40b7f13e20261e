"""Shared BASELINE config-3 pieces: the train-step model and its timing
recipe. Used by benchmarks/run_all.py (config3) AND
benchmarks/remat_sweep.py so the two stay cross-comparable — BENCHES.md
quotes the sweep against the config-3 headline, which only holds while
both build and time the exact same step. Extend HERE, never re-copy.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def build_model(size: int = 224):
    """The config-3 flagship: token-latent encoder + 2-layer temporal
    transformer, bf16 compute."""
    from tchvp_tpu.config import ResNetAEConfig, TransformerConfig, VideoModelConfig
    from tchvp_tpu.models import VideoHybridNet

    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(token_latent=True),
        temporal=TransformerConfig(
            input_dim=(size // 4) ** 2, hidden_dim=2048, num_layers=2, num_heads=8
        ),
    )
    return VideoHybridNet(config=cfg, dtype=jnp.bfloat16)


def make_state(model, size: int = 224):
    from tchvp_tpu.train import create_train_state, make_optimizer

    return create_train_state(
        model,
        jnp.zeros((1, 2, size, size, 3)),
        make_optimizer(1e-4, grad_clip_norm=1.0),
        jax.random.PRNGKey(0),
    )


def make_batch(batch: int, frames: int = 16, size: int = 224) -> np.ndarray:
    return np.random.default_rng(0).integers(
        0, 256, (batch, frames, size, size, 3), dtype=np.uint8
    )


def time_train_step(step, state, batch, reps: int = 3, inner: int = 5):
    """(median_seconds_per_step, final_state) after a compile/warm call.

    One scalar readback per ``inner`` chain drains the async dispatch —
    per-call block_until_ready under-reports on the axon tunnel
    (utils/timing.py rationale); the state threads through because the
    step donates it.
    """
    state, m = step(state, batch)  # compile + warm
    _ = float(m["loss"])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            state, m = step(state, batch)
        _ = float(m["loss"])
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times)), state
