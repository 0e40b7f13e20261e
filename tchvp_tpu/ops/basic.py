"""Pooling / resampling primitives (NHWC), XLA-fusion friendly.

Equivalents of the reference's ``nn.MaxPool2d(2)`` (FCT.py:147),
``nn.AvgPool2d(2,2)`` (FCT.py:220) and ``nn.Upsample(scale_factor=2)``
(nearest, FCT.py:170 / AutoEncoder.py:35).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool over NHWC."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool over NHWC (the reference's image pyramid op)."""
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample over NHWC.

    Implemented as reshape+broadcast (pure data movement XLA folds into the
    consumer) rather than a gather-based ``jax.image.resize``.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
