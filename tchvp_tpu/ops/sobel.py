"""Sobel edge visualization, on-device.

The reference post-processes inference masks with ``scipy.ndimage.sobel``
on the host (``FCT.py:398-402``). Here it's a fused XLA conv so the
gradient-magnitude image never leaves the device until save time.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tchvp_tpu.config import SobelConfig


def sobel_edges(
    x: jnp.ndarray, config: Optional[SobelConfig] = None
) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, C) normalized [0,1] gradient magnitude.

    Matches scipy's default axis-0/axis-1 sobel pair + magnitude + max
    normalization (FCT.py:398-401), with REFLECT padding like
    scipy.ndimage's default 'reflect' mode.
    """
    c = x.shape[-1]
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)
    kx = ky.T
    kern = np.stack([ky, kx], axis=-1)  # (3, 3, 2)
    kern = np.tile(kern[:, :, None, :], (1, 1, 1, 1))  # HWIO (3,3,1,2)
    xpad = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"
    )
    # Depthwise: apply both kernels per channel.
    outs = []
    for ch in range(c):
        dn = jax.lax.conv_dimension_numbers(
            xpad[..., ch : ch + 1].shape, kern.shape, ("NHWC", "HWIO", "NHWC")
        )
        g = jax.lax.conv_general_dilated(
            xpad[..., ch : ch + 1], jnp.asarray(kern), (1, 1), "VALID",
            dimension_numbers=dn,
        )  # (B, H, W, 2)
        mag = jnp.sqrt(jnp.sum(g * g, axis=-1))
        outs.append(mag)
    mag = jnp.stack(outs, axis=-1)
    # Degenerate flat input: the reference divides by np.max(...) == 0 and
    # NaNs out (FCT.py:401); fp rounding can also leave ~1e-7 residue on a
    # constant image, which a bare max-normalize would amplify to full
    # scale. A max gradient below edge_floor_rel of the input range is
    # "no edges" -> zeros (thresholds in config.SobelConfig).
    cfg = config or SobelConfig()
    mx = jnp.max(mag)
    floor = cfg.edge_floor_rel * jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32))), cfg.eps
    )
    return jnp.where(mx > floor, mag / jnp.maximum(mx, floor), jnp.zeros_like(mag))
