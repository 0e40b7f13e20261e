"""Streaming long-video processing (BASELINE config 4).

The reference has no long-video path at all — its clip loader materializes
whole clips (recovered ``dataset.py`` L106-113) and its temporal attention
is full-quadratic (``TransformerEncoder.py`` L51). This module is the
genuinely new algorithmic design called out in survey §7.4:

* **1080p frames tile to patches** (:mod:`tchvp_tpu.ops.tiling`): each tile
  becomes an independent clip in the batch, so the CNN encoder + temporal
  transformer run with static shapes at their native operating point and
  the tile-batch dim shards over the ``data`` mesh axis.
* **Chunked temporal processing with carried context**: the clip is scanned
  in fixed-size chunks via ``jax.lax.scan``; each chunk's temporal
  attention sees ``ctx_frames`` of raw encoder tokens carried from the
  previous chunk — overlapping-window attention across unbounded video
  length with O(chunk) memory and one compiled program regardless of T.
* **Multi-host sharded input**: each host feeds its slice of the tile
  batch (:func:`tchvp_tpu.parallel.mesh.host_local_batch_slice`), and
  :func:`stream_sharding` places tiles over the mesh.

Everything is a pure function over a trained :class:`VideoHybridNet`'s
variables — the flagship model streams directly, no separate weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tchvp_tpu.models.video import VideoHybridNet
from tchvp_tpu.ops import tiling


@dataclasses.dataclass(frozen=True)
class StreamingConfig:
    """Operating point of the streaming path.

    ``tile``: square patch size frames are tiled into (frames smaller than
    ``tile`` pass through untiled). ``chunk_len``: frames per scan step.
    ``ctx_frames``: frames of previous-chunk context visible to each
    chunk's temporal attention (the overlap of the overlapping window).
    """

    tile: int = 256
    chunk_len: int = 8
    ctx_frames: int = 4


def stream_clip(
    model: VideoHybridNet,
    variables: Any,
    clip: jnp.ndarray,
    chunk_len: int,
    ctx_frames: int = 0,
) -> jnp.ndarray:
    """Process (B, T, H, W, C) in chunks of ``chunk_len`` frames.

    ``lax.scan`` carries the raw encoder tokens of the last ``ctx_frames``
    frames; each chunk's temporal transformer attends over
    [context || chunk] and only the chunk's tokens are decoded. T must be
    a multiple of ``chunk_len``. Returns the reconstructed clip.
    """
    b, t = clip.shape[0], clip.shape[1]
    if t % chunk_len:
        raise ValueError(f"clip length {t} not a multiple of chunk {chunk_len}")
    if ctx_frames > chunk_len:
        raise ValueError("ctx_frames must be <= chunk_len")
    tpf = model.config.tokens_per_frame
    nchunks = t // chunk_len

    # (B, T, ...) -> (nchunks, B, chunk_len, ...) for scan.
    xs = clip.reshape((b, nchunks, chunk_len) + clip.shape[2:])
    xs = jnp.moveaxis(xs, 1, 0)

    def encode(chunk):
        return model.apply(variables, chunk, method=VideoHybridNet.encode_clip)

    def mix(tokens):
        return model.apply(variables, tokens, method=VideoHybridNet.temporal_mix)

    def decode(tokens, hw):
        return model.apply(
            variables, tokens, hw, method=VideoHybridNet.decode_tokens
        )

    ctx_tokens = ctx_frames * tpf

    def body(carry, chunk):
        tokens, hw = encode(chunk)  # (B, chunk_len*tpf, D)
        if ctx_tokens:
            mixed = mix(jnp.concatenate([carry, tokens], axis=1))
            out_tokens = mixed[:, ctx_tokens:]
            new_carry = tokens[:, -ctx_tokens:]
        else:
            out_tokens = mix(tokens)
            new_carry = carry
        recon = decode(out_tokens, hw)
        return new_carry, recon

    # Static latent dim: tokens embed the hh*ww latent map, hh = H/4.
    d = (clip.shape[2] // 4) * (clip.shape[3] // 4)
    init = jnp.zeros((b, ctx_tokens, d), model.dtype)
    _, recon_chunks = jax.lax.scan(body, init, xs)
    # (nchunks, B, chunk_len, H, W, C') -> (B, T, H, W, C')
    recon = jnp.moveaxis(recon_chunks, 0, 1)
    return recon.reshape((b, t) + recon.shape[3:])


def stream_video(
    model: VideoHybridNet,
    variables: Any,
    clip: jnp.ndarray,
    cfg: StreamingConfig = StreamingConfig(),
) -> jnp.ndarray:
    """Full streaming path: pad -> tile -> chunked scan -> untile -> crop.

    clip: (B, T, H, W, C) at any resolution (e.g. 1080p); returns the
    reconstruction at the input resolution. Jit this function (it is pure);
    the compiled program is reused for every clip of the same shape.
    """
    needs_tiling = clip.shape[2] > cfg.tile or clip.shape[3] > cfg.tile
    if needs_tiling:
        padded, orig_hw = tiling.pad_frames(clip, cfg.tile)
        tiles, grid = tiling.tile_frames(padded, cfg.tile)
    else:
        # Encoder downsamples 4x: keep dims a multiple of 4.
        padded, orig_hw = tiling.pad_frames(clip, 4)
        tiles, grid = padded, (1, 1)

    recon_tiles = stream_clip(
        model, variables, tiles, cfg.chunk_len, cfg.ctx_frames
    )
    if needs_tiling:
        return tiling.untile_frames(recon_tiles, grid, orig_hw)
    return recon_tiles[:, :, : orig_hw[0], : orig_hw[1], :]


def microbatched_infer(
    model: VideoHybridNet,
    variables: Any,
    clip: jnp.ndarray,
    microbatch: int,
) -> jnp.ndarray:
    """Inference at a batch size whose activations exceed HBM.

    Clips in a batch are independent (temporal attention couples frames
    only within a clip), so a big batch runs as ``B/microbatch``
    sequential groups via ``lax.map``: peak activation memory is one
    group's, weights stay resident, and XLA compiles the body once.
    This is how BASELINE config 2 reaches batch 16 on a single 16 GB
    chip — the 384px decoder's activations for 512 folded frames would
    otherwise need ~29 GB (BENCHES.md). Throughput matches the
    equivalent sequence of small batches; latency of the full batch is
    the sum of its groups.

    clip: (B, T, H, W, C), B a multiple of ``microbatch``. Returns the
    reconstruction; jit the call (pure function of its inputs).
    """
    b = clip.shape[0]
    if b % microbatch:
        raise ValueError(f"batch {b} not a multiple of microbatch {microbatch}")
    groups = clip.reshape((b // microbatch, microbatch) + clip.shape[1:])
    recon = jax.lax.map(
        lambda g: model.apply(variables, g, deterministic=True)[1], groups
    )
    return recon.reshape((b,) + recon.shape[2:])


def stream_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for the tile batch: dim 0 (tiles) over the data axis."""
    return NamedSharding(mesh, P(axis, None, None, None, None))


def shard_tiles(tiles: jnp.ndarray, mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """Place a host tile batch with tiles sharded over the mesh."""
    return jax.device_put(tiles, stream_sharding(mesh, axis))


def make_streamer(
    model: VideoHybridNet,
    variables: Any,
    cfg: StreamingConfig = StreamingConfig(),
    mesh: Optional[Mesh] = None,
    int8_engine: Any = None,
):
    """Compile a reusable streaming function ``f(clip) -> recon``.

    With a mesh, inputs are sharded over the data axis before the jitted
    call so XLA partitions the whole pipeline (tile conv + attention) and
    inserts collectives only where needed (there are none — tiles are
    independent, so streaming scales linearly over chips/hosts).

    ``variables`` ride as a jit argument, not a closure capture — captured
    params would be baked into the compiled program as constants (hundreds
    of MB of HLO for the flagship).

    ``int8_engine``: a calibrated :class:`tchvp_tpu.infer.Int8Engine` for
    ``model`` — the conv stack then runs int8 inside the tiled scan
    (measured 1.30× at 1080p, BENCHES.md). Its qparams ride as a jit
    argument like the variables.
    """
    if int8_engine is not None:
        def run(qp, v, clip):
            with int8_engine.intercepting(qp):
                return stream_video(model, v, clip, cfg)

        jitted8 = jax.jit(run)

        def call(clip):
            if mesh is not None:
                clip = jax.device_put(
                    clip, NamedSharding(mesh, P("data", None, None, None, None))
                )
            return jitted8(int8_engine.qparams, variables, clip)

        return call

    jitted = jax.jit(lambda v, clip: stream_video(model, v, clip, cfg))

    if mesh is None:
        return lambda clip: jitted(variables, clip)

    def sharded(clip):
        clip = jax.device_put(
            clip, NamedSharding(mesh, P("data", None, None, None, None))
        )
        return jitted(variables, clip)

    return sharded
