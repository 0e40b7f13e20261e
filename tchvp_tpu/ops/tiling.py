"""Spatial frame tiling for the streaming high-resolution path.

The reference caps out at 256x256 full-frame processing (its models assume
square power-of-two inputs, e.g. ``FCT.py:77``'s sqrt(HW) reshape). For
1080p-class streaming (BASELINE config 4) frames are tiled into fixed
square patches; each tile becomes an independent clip in the batch, so the
per-frame CNN and the temporal transformer run over tiles at their native
operating point with static shapes, and the tile-batch dim shards cleanly
over the ``data`` mesh axis.

Pure reshape/transpose ops — XLA fuses them into the surrounding compute.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pad_frames(
    clip: jnp.ndarray, multiple: int
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Edge-pad (B, T, H, W, C) so H and W are multiples of ``multiple``.

    Edge (replicate) padding keeps tile statistics natural at the frame
    border, unlike zero padding which would inject fake black bands.
    Returns (padded clip, original (H, W)) for later cropping.
    """
    h, w = clip.shape[2], clip.shape[3]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        clip = jnp.pad(
            clip,
            ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)),
            mode="edge",
        )
    return clip, (h, w)


def tile_frames(
    clip: jnp.ndarray, tile: int
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, T, H, W, C) -> (B*gh*gw, T, tile, tile, C) tile clips.

    H and W must be multiples of ``tile`` (use :func:`pad_frames` first).
    Returns (tiles, (gh, gw)) where gh*gw is the tile grid. Tiles of one
    source clip are contiguous in the batch dim, so an even tile-batch
    shard over the mesh keeps whole frames on as few devices as possible.
    """
    b, t, h, w, c = clip.shape
    if h % tile or w % tile:
        raise ValueError(f"frame {h}x{w} not a multiple of tile {tile}")
    gh, gw = h // tile, w // tile
    x = clip.reshape(b, t, gh, tile, gw, tile, c)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5, 6))  # (B, gh, gw, T, th, tw, C)
    return x.reshape(b * gh * gw, t, tile, tile, c), (gh, gw)


def untile_frames(
    tiles: jnp.ndarray,
    grid: Tuple[int, int],
    orig_hw: Tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Inverse of :func:`tile_frames`; optionally crop back to ``orig_hw``."""
    gh, gw = grid
    bt, t, th, tw, c = tiles.shape
    b = bt // (gh * gw)
    x = tiles.reshape(b, gh, gw, t, th, tw, c)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5, 6))  # (B, T, gh, th, gw, tw, C)
    out = x.reshape(b, t, gh * th, gw * tw, c)
    if orig_hw is not None:
        out = out[:, :, : orig_hw[0], : orig_hw[1], :]
    return out
