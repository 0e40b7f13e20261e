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


def random_rot90(key: jax.Array, x: jnp.ndarray, prob: float) -> jnp.ndarray:
    """Per-sample rotation by a random multiple of 90 degrees (square
    images). Static shapes: all four rotations are materialized and a
    per-sample k in {0,1,2,3} selects — 3 extra elementwise copies on
    the augmentation path, zero dynamic shapes for XLA."""
    if x.shape[-3] != x.shape[-2]:
        raise ValueError("random_rot90 needs square spatial dims")
    b = x.shape[0]
    k_gate, k_k = jax.random.split(key)
    ks = jax.random.randint(k_k, (b,), 0, 4)
    ks = jnp.where(jax.random.bernoulli(k_gate, prob, (b,)), ks, 0)
    sel = ks.reshape((b,) + (1,) * (x.ndim - 1))
    out = x
    for k in (1, 2, 3):
        out = jnp.where(sel == k, jnp.rot90(x, k, axes=(-3, -2)), out)
    return out


def random_crop_resize(
    key: jax.Array, x: jnp.ndarray, prob: float, frac: float
) -> jnp.ndarray:
    """Per-sample random crop of a FIXED fraction, resized back.

    The crop size is static (``frac`` of H/W); only the offsets are
    random, so shapes stay compile-time constant. For clips the crop is
    shared across the sample's frames (one geometry per video)."""
    h, w = x.shape[-3], x.shape[-2]
    ch, cw = max(int(round(h * frac)), 1), max(int(round(w * frac)), 1)
    if (ch, cw) == (h, w):
        return x
    b = x.shape[0]
    k_gate, k_off = jax.random.split(key)
    offs = jnp.stack(
        [
            jax.random.randint(k_off, (b,), 0, h - ch + 1),
            jax.random.randint(jax.random.fold_in(k_off, 1), (b,), 0, w - cw + 1),
        ],
        axis=-1,
    )

    def crop_one(img: jnp.ndarray, off: jnp.ndarray) -> jnp.ndarray:
        starts = (0,) * (img.ndim - 3) + (off[0], off[1], 0)
        sizes = img.shape[:-3] + (ch, cw, img.shape[-1])
        return jax.lax.dynamic_slice(img, starts, sizes)

    cropped = jax.vmap(crop_one)(x, offs)
    resized = resize_bilinear(cropped, (h, w))
    gate = jax.random.bernoulli(k_gate, prob, (b,)).reshape(
        (b,) + (1,) * (x.ndim - 1)
    )
    return jnp.where(gate, resized.astype(x.dtype), x)


def color_jitter(
    key: jax.Array, x: jnp.ndarray, prob: float, strength: float
) -> jnp.ndarray:
    """Per-sample brightness / contrast / saturation jitter on [0,1]
    images (torchvision ColorJitter semantics, elementwise — XLA fuses
    the whole chain into one pass)."""
    b = x.shape[0]
    k_gate, kb, kc, ks = jax.random.split(key, 4)
    shape = (b,) + (1,) * (x.ndim - 1)
    bright = jax.random.uniform(
        kb, shape, x.dtype, -strength, strength
    )
    contrast = jax.random.uniform(
        kc, shape, x.dtype, 1.0 - strength, 1.0 + strength
    )
    sat = jax.random.uniform(
        ks, shape, x.dtype, 1.0 - strength, 1.0 + strength
    )
    gray = x.mean(axis=-1, keepdims=True)
    y = (x - gray) * sat + gray
    mean = y.mean(axis=tuple(range(1, x.ndim)), keepdims=True)
    y = (y - mean) * contrast + mean + bright
    y = jnp.clip(y, 0.0, 1.0)
    gate = jax.random.bernoulli(k_gate, prob, (b,)).reshape(shape)
    return jnp.where(gate, y, x)


def augment_geometric(
    key: jax.Array,
    clean: jnp.ndarray,
    cfg: AugmentConfig = AugmentConfig(),
) -> jnp.ndarray:
    """Beyond-reference augmentation suite (all OFF by default — the
    reference's chain is exactly :func:`augment_denoising`): per-sample
    rot90 / fixed-fraction crop-resize / color jitter, applied to the
    CLEAN image BEFORE corruption so reconstruction targets stay
    consistent with inputs."""
    if cfg.rot90_prob > 0.0:
        key, k = jax.random.split(key)
        clean = random_rot90(k, clean, cfg.rot90_prob)
    if cfg.crop_prob > 0.0:
        key, k = jax.random.split(key)
        clean = random_crop_resize(k, clean, cfg.crop_prob, cfg.crop_frac)
    if cfg.jitter_prob > 0.0:
        key, k = jax.random.split(key)
        clean = color_jitter(k, clean, cfg.jitter_prob, cfg.jitter_strength)
    return clean


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
