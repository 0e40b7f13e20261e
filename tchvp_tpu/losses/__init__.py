"""Losses & metrics (survey layer L2).

Capability-equivalent to reference ``Metrics.py:5-57`` (== recovered
``metric.py`` L6-57) plus the inline PSNR at ``Model.py:30``. All are pure
functions over NHWC arrays (channel handling mirrors the reference's
channel-0 selection on NCHW).
"""

from __future__ import annotations


import jax.numpy as jnp

from tchvp_tpu.ops.msssim import ms_ssim, ssim

__all__ = [
    "dice_loss",
    "jaccard_score",
    "psnr",
    "mse",
    "mixed_loss",
    "ms_ssim",
    "ssim",
]


def dice_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Soft Dice loss on channel 0 (reference ``Metrics.py:14-22``).

    Inputs NHWC (or any layout with channels last); channel 0 is flattened
    exactly as the reference flattens ``y[:, 0]``.
    """
    assert y_pred.shape == y_true.shape
    p = y_pred[..., 0].reshape(-1).astype(jnp.float32)
    t = y_true[..., 0].reshape(-1).astype(jnp.float32)
    intersection = jnp.sum(p * t)
    dsc = (2.0 * intersection + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)
    return 1.0 - dsc


def jaccard_score(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """IoU via logical and/or on channel 0 (reference ``Metrics.py:32-39``)."""
    assert y_pred.shape == y_true.shape
    p = y_pred[..., 0].reshape(-1) != 0
    t = y_true[..., 0].reshape(-1) != 0
    intersection = jnp.sum(jnp.logical_and(t, p))
    union = jnp.sum(jnp.logical_or(t, p))
    return intersection.astype(jnp.float32) / union.astype(jnp.float32)


def mse(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    d = (y_pred.astype(jnp.float32) - y_true.astype(jnp.float32))
    return jnp.mean(d * d)


def psnr(reconstructed: jnp.ndarray, original: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """PSNR in dB (reference ``Model.py:30``)."""
    return 20.0 * jnp.log10(max_val / jnp.sqrt(mse(reconstructed, original)))


def mixed_loss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    alpha: float = 0.5,
    beta: float = 0.5,
    *,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """alpha*(1 - MS-SSIM) + beta*MSE (reference ``Metrics.py:44-57``).

    ``data_range`` defaults to the correct 1.0 for [0,1] images; the
    reference inherits pytorch_msssim's 255 default (quirk, see
    ``tchvp_tpu.ops.msssim``).
    """
    msssim_term = 1.0 - ms_ssim(y_pred, y_true, data_range=data_range)
    return alpha * msssim_term + beta * mse(y_pred, y_true)
