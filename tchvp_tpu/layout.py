"""Layout adapters between reference (NCHW) and TPU-native (NHWC) tensors.

The reference codebase is PyTorch-NCHW throughout (e.g. reference
``AutoEncoder.py:139`` feeds ``(1, 3, 256, 256)``). TPU convolutions want
NHWC so the channel dim lands on the 128-lane axis; all tchvp_tpu modules
are NHWC internally and these helpers convert at the public boundary.
"""

from __future__ import annotations

import jax.numpy as jnp


def nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, H, W)."""
    return jnp.transpose(x, (0, 3, 1, 2))


def ncthw_to_nthwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, T, H, W) -> (B, T, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def ntchw_to_nthwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C, H, W) -> (B, T, H, W, C)."""
    return jnp.transpose(x, (0, 1, 3, 4, 2))


def nthwc_to_ntchw(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T, C, H, W)."""
    return jnp.transpose(x, (0, 1, 4, 2, 3))


def fold_time(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B*T, H, W, C): fold clip frames into batch.

    Per-frame convs run over the folded batch so the MXU sees one large
    batched conv instead of a Python loop over frames (reference loops over
    frame tensors from ``dataset.py`` L106-113 instead).
    """
    b, t = x.shape[0], x.shape[1]
    return x.reshape((b * t,) + x.shape[2:])


def unfold_time(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """(B*T, ...) -> (B, T, ...)."""
    bt = x.shape[0]
    t = bt // batch
    return x.reshape((batch, t) + x.shape[1:])
