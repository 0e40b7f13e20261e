"""Streaming long-video path (BASELINE config 4): tiling, chunked scan
with carried context, multi-host-style sharded tiles.

The reference has no streaming/long-video capability (survey §5.7); these
tests pin the NEW design: tile/untile are exact inverses, chunked
processing with full-clip chunks matches the non-streaming flagship
forward, and the tile batch shards over an 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tchvp_tpu.config import ResNetAEConfig, TransformerConfig, VideoModelConfig
from tchvp_tpu.models import VideoHybridNet
from tchvp_tpu.models.streaming import (
    StreamingConfig,
    make_streamer,
    stream_clip,
    stream_video,
)
from tchvp_tpu.ops import tiling


def tiny_model(image_size=16):
    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(layers=(1, 1), token_latent=True),
        temporal=TransformerConfig(
            input_dim=(image_size // 4) ** 2,
            hidden_dim=16,
            num_layers=1,
            num_heads=4,
        ),
    )
    return VideoHybridNet(config=cfg)


def test_tile_untile_roundtrip():
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.normal(size=(2, 3, 8, 12, 3)).astype(np.float32))
    padded, orig_hw = tiling.pad_frames(clip, 4)
    tiles, grid = tiling.tile_frames(padded, 4)
    assert tiles.shape == (2 * 2 * 3, 3, 4, 4, 3)
    back = tiling.untile_frames(tiles, grid, orig_hw)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(clip))


def test_pad_frames_edge_mode():
    clip = jnp.arange(2 * 5 * 6 * 1, dtype=jnp.float32).reshape(1, 2, 5, 6, 1)
    padded, (h, w) = tiling.pad_frames(clip, 4)
    assert padded.shape == (1, 2, 8, 8, 1)
    assert (h, w) == (5, 6)
    # Edge padding replicates the border row/col.
    np.testing.assert_array_equal(
        np.asarray(padded[0, 0, 5]), np.asarray(padded[0, 0, 4])
    )


def test_stream_single_chunk_matches_full_forward():
    """chunk_len == T, no context: streaming must equal the flagship
    model's own forward pass exactly."""
    model = tiny_model(16)
    clip = jnp.asarray(
        np.random.default_rng(1).uniform(size=(2, 4, 16, 16, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), clip)
    _, want = model.apply(variables, clip)
    got = stream_clip(model, variables, clip, chunk_len=4, ctx_frames=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_stream_chunked_with_context_shapes_and_determinism():
    model = tiny_model(16)
    clip = jnp.asarray(
        np.random.default_rng(2).uniform(size=(1, 8, 16, 16, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), clip[:, :2])
    out1 = stream_clip(model, variables, clip, chunk_len=4, ctx_frames=2)
    out2 = stream_clip(model, variables, clip, chunk_len=4, ctx_frames=2)
    assert out1.shape == (1, 8, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # Context must actually change the result vs context-free chunking.
    out0 = stream_clip(model, variables, clip, chunk_len=4, ctx_frames=0)
    assert not np.allclose(np.asarray(out1), np.asarray(out0))


def test_stream_video_tiles_high_res():
    """A 'widescreen' frame larger than the tile size: pad -> tile ->
    stream -> untile -> crop back to input resolution."""
    model = tiny_model(16)
    cfg = StreamingConfig(tile=16, chunk_len=2, ctx_frames=1)
    clip = jnp.asarray(
        np.random.default_rng(3).uniform(size=(1, 4, 30, 44, 3)).astype(np.float32)
    )
    example = jnp.zeros((1, 2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), example)
    out = jax.jit(lambda c: stream_video(model, variables, c, cfg))(clip)
    assert out.shape == (1, 4, 30, 44, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_stream_video_small_frame_no_tiling():
    model = tiny_model(16)
    cfg = StreamingConfig(tile=16, chunk_len=2, ctx_frames=0)
    clip = jnp.asarray(
        np.random.default_rng(4).uniform(size=(2, 4, 14, 15, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)))
    out = stream_video(model, variables, clip, cfg)
    assert out.shape == (2, 4, 14, 15, 3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_streamer_sharded_over_mesh():
    """Tile batch sharded over an 8-device data mesh — the multi-host
    input-sharding pattern of BASELINE config 4 on CPU devices."""
    from tchvp_tpu.parallel import make_mesh

    model = tiny_model(16)
    mesh = make_mesh(("data",))
    cfg = StreamingConfig(tile=16, chunk_len=2, ctx_frames=1)
    # batch 8 so the clip batch itself splits evenly over the mesh.
    clip = jnp.asarray(
        np.random.default_rng(5).uniform(size=(8, 4, 16, 16, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)))
    streamer = make_streamer(model, variables, cfg, mesh=mesh)
    out = streamer(clip)
    assert out.shape == (8, 4, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_microbatched_infer_matches_full_batch():
    """lax.map microbatching (BASELINE config 2 at spec batch on one
    chip) must reproduce the plain batched forward exactly."""
    from tchvp_tpu.models import microbatched_infer

    model = tiny_model(16)
    clip = jnp.asarray(
        np.random.default_rng(7).uniform(size=(6, 4, 16, 16, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), clip[:1])
    _, want = model.apply(variables, clip, deterministic=True)
    got = jax.jit(
        lambda v, c: microbatched_infer(model, v, c, microbatch=2)
    )(variables, clip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError):
        microbatched_infer(model, variables, clip, microbatch=4)
