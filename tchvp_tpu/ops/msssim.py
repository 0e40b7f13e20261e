"""SSIM / MS-SSIM in pure JAX.

The reference delegates to ``pytorch_msssim.ms_ssim`` (``Metrics.py:3,53``);
this is a from-scratch JAX implementation with the same algorithm:
11-tap gaussian window (sigma 1.5), K1=0.01 / K2=0.03, valid-padded
separable depthwise filtering, 5 scales with weights
[0.0448, 0.2856, 0.3001, 0.2363, 0.1333], ReLU'd contrast-structure terms.

Quirk note (survey §7.5-adjacent): the reference calls ``ms_ssim`` with the
library default ``data_range=255`` on [0,1] images, which collapses the
MS-SSIM term to ~0 inside MixedLoss. ``data_range`` here defaults to the
*correct* 1.0 for [0,1] inputs; pass 255.0 to reproduce the reference quirk.

Operates on NHWC.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise gaussian blur, VALID padding, NHWC."""
    c = x.shape[-1]
    size = window.shape[0]
    wh = jnp.tile(window.reshape(size, 1, 1, 1), (1, 1, 1, c))
    ww = jnp.tile(window.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, wh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, wh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, ww.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, ww, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )


def _ssim_per_channel(
    x: jnp.ndarray,
    y: jnp.ndarray,
    window: jnp.ndarray,
    data_range: float,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ssim, cs), each (B, C): spatial mean of the per-pixel maps."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _blur(x, window)
    mu_y = _blur(y, window)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _blur(x * x, window) - mu_xx
    sigma_y = _blur(y * y, window) - mu_yy
    sigma_xy = _blur(x * y, window) - mu_xy

    cs_map = (2.0 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    return ssim_map.mean(axis=(1, 2)), cs_map.mean(axis=(1, 2))


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over batch and channels; x, y are NHWC in [0, data_range]."""
    window = jnp.asarray(_gaussian_window(window_size, sigma))
    s, _ = _ssim_per_channel(
        x.astype(jnp.float32), y.astype(jnp.float32), window, data_range
    )
    return s.mean()


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    weights: Sequence[float] = _MS_WEIGHTS,
) -> jnp.ndarray:
    """Multi-scale SSIM over NHWC images. Spatial dims must survive
    ``2**(len(weights)-1)`` halvings with >= window_size pixels left
    (matching the pytorch_msssim requirement)."""
    min_side = (window_size - 1) * 2 ** (len(weights) - 1)
    if min(x.shape[1], x.shape[2]) <= min_side:
        raise ValueError(
            f"ms_ssim needs spatial dims > {min_side} for {len(weights)} scales "
            f"with window {window_size}; got {x.shape[1]}x{x.shape[2]}"
        )
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    window = jnp.asarray(_gaussian_window(window_size, sigma))
    w = jnp.asarray(weights, dtype=jnp.float32)

    mcs = []
    ssim_val = None
    for i in range(len(weights)):
        ssim_val, cs = _ssim_per_channel(x, y, window, data_range)
        if i < len(weights) - 1:
            mcs.append(nn_relu(cs))
            x = avg_pool2(x)
            y = avg_pool2(y)
    stack = jnp.stack(mcs + [nn_relu(ssim_val)], axis=0)  # (scales, B, C)
    out = jnp.prod(stack ** w.reshape(-1, 1, 1), axis=0)
    return out.mean()


def nn_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0.0)


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool matching ``F.avg_pool2d(kernel_size=2,
    padding=[H%2, W%2])`` — what pytorch_msssim downsamples with.

    torch's ``padding`` pads BOTH sides with zeros and counts them in the
    average (``count_include_pad=True``); with stride 2 the bottom/right
    pad row never enters a window, so this equals a zero-pad at the TOP/
    LEFT only. The first window of an odd dim is ``(0 + x0) / 4`` — NOT
    an edge-replicated or cropped pool (round-4 fidelity fix: the old
    bottom/right padding silently diverged from the reference library on
    odd intermediate sizes, e.g. any 250px input at scale 2). Even-size
    inputs are unaffected.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (h % 2, 0), (w % 2, 0), (0, 0)))
    import flax.linen as nn_mod

    return nn_mod.avg_pool(x, window_shape=(2, 2), strides=(2, 2))
