"""Fused on-device preprocessing + augmentation (build-new component ⊕D).

The reference decodes/resizes per item on the host via PIL
(``Dataloader.py:17-23``, recovered ``dataset.py`` L27-30). Here the host
only decodes JPEG bytes to uint8; everything after — cast, resize,
normalize, augment, clip-stack — is a single jitted function that XLA fuses
on device, so HBM sees one pass over the pixels.

Augmentations are pure functions of explicit PRNG keys, mirroring the
reference's denoising-AE recipe (``Model.py:44-53``): hflip p=0.5, gaussian
noise x0.05 p=0.2, 0-3 random 16x16 blackout patches (32x32 at test time,
``Model.py:106-109``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tchvp_tpu.config import AugmentConfig


def normalize_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1] (torchvision ToTensor semantics)."""
    return x.astype(jnp.float32) / 255.0


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (..., size[0], size[1], C)."""
    out_shape = x.shape[:-3] + (size[0], size[1], x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear")


def preprocess_images(
    raw: jnp.ndarray, image_size: int, dtype=jnp.float32
) -> jnp.ndarray:
    """(B, H, W, C) uint8 -> resized, normalized (B, S, S, C) float."""
    x = normalize_uint8(raw)
    if raw.shape[1] != image_size or raw.shape[2] != image_size:
        x = resize_bilinear(x, (image_size, image_size))
    return x.astype(dtype)


def preprocess_clip(
    raw: jnp.ndarray, image_size: int, dtype=jnp.float32
) -> jnp.ndarray:
    """(B, T, H, W, C) uint8 -> (B, T, S, S, C) float: the fused
    decode->resize->normalize->clip-stack stage of BASELINE config 1."""
    b, t = raw.shape[0], raw.shape[1]
    flat = raw.reshape((b * t,) + raw.shape[2:])
    out = preprocess_images(flat, image_size, dtype)
    return out.reshape((b, t) + out.shape[1:])


def random_hflip(key: jax.Array, x: jnp.ndarray, prob: float = 0.5) -> jnp.ndarray:
    """Batch-level horizontal flip (the reference flips the whole batch at
    once, Model.py:44-45)."""
    flip = jax.random.bernoulli(key, prob)
    return jax.lax.cond(flip, lambda v: v[..., :, ::-1, :], lambda v: v, x)


def gaussian_noise(key: jax.Array, x: jnp.ndarray, std: float = 0.05) -> jnp.ndarray:
    return x + jax.random.normal(key, x.shape, x.dtype) * jnp.asarray(std, x.dtype)


def random_blackout(
    key: jax.Array,
    x: jnp.ndarray,
    max_patches: int = 3,
    patch: int = 16,
) -> jnp.ndarray:
    """Zero 0..max_patches random patch x patch squares (whole batch shares
    patch locations, mirroring Model.py:49-53). Static shapes: every patch
    slot is computed, inactive slots multiply by an all-ones mask."""
    h, w = x.shape[-3], x.shape[-2]
    k_count, key = jax.random.split(key)
    n_active = jax.random.randint(k_count, (), 0, max_patches + 1)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mask = jnp.ones((h, w), x.dtype)
    for i in range(max_patches):
        key, kx, ky = jax.random.split(key, 3)
        r0 = jax.random.randint(kx, (), 0, h - patch + 1)
        c0 = jax.random.randint(ky, (), 0, w - patch + 1)
        inside = (rows >= r0) & (rows < r0 + patch) & (cols >= c0) & (cols < c0 + patch)
        active = i < n_active
        mask = mask * jnp.where(inside & active, 0.0, 1.0).astype(x.dtype)
    return x * mask[..., None]


def augment_denoising(
    key: jax.Array,
    image: jnp.ndarray,
    cfg: AugmentConfig = AugmentConfig(),
) -> jnp.ndarray:
    """The reference's denoising-AE augmentation chain (Model.py:44-53):
    returns the corrupted input; the loss target stays the clean image."""
    k_flip, k_noise_gate, k_noise, k_patch_gate, k_patch = jax.random.split(key, 5)
    x = random_hflip(k_flip, image, cfg.hflip_prob)

    def corrupt(v: jnp.ndarray) -> jnp.ndarray:
        noised = gaussian_noise(k_noise, image, cfg.noise_std)
        blacked = jax.lax.cond(
            jax.random.bernoulli(k_patch_gate, 0.5),
            lambda u: random_blackout(
                k_patch, u, cfg.max_blackout_patches, cfg.blackout_size
            ),
            lambda u: u,
            noised,
        )
        return blacked

    return jax.lax.cond(
        jax.random.bernoulli(k_noise_gate, cfg.noise_prob), corrupt, lambda v: v, x
    )


def corrupt_for_test(
    key: jax.Array, image: jnp.ndarray, cfg: AugmentConfig = AugmentConfig()
) -> jnp.ndarray:
    """Test-time inpainting corruption: 0-3 random 32x32 blackouts
    (Model.py:106-109)."""
    return random_blackout(key, image, cfg.max_blackout_patches, cfg.test_blackout_size)
