"""AOT serving artifacts (infer/export.py, `tchvp export`).

The TPU-native replacement for the reference's ship-the-Python-code
deployment (`/root/reference/FCT.py:410-412` eager inference from a
checkpoint): serialize the lowered StableHLO + weights, reload with zero
model code, get bit-identical outputs and batch polymorphism.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tchvp_tpu.config import flagship_video_config
from tchvp_tpu.data import pipeline
from tchvp_tpu.infer import export as export_lib
from tchvp_tpu.models import VideoHybridNet

SIZE = 32
CLIP_LEN = 4


@pytest.fixture(scope="module")
def hybrid():
    cfg = flagship_video_config(image_size=SIZE)
    model = VideoHybridNet(config=cfg)
    vs = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, CLIP_LEN, SIZE, SIZE, 3))
    )
    return model, vs


def _batch(b, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(
            0, 255, (b, CLIP_LEN, SIZE, SIZE, 3), dtype=np.uint8
        )
    )


def test_roundtrip_bit_exact_and_batch_polymorphic(hybrid, tmp_path):
    model, vs = hybrid
    exported, w = export_lib.export_video_model(
        model, vs, clip_len=CLIP_LEN, image_size=SIZE
    )
    path = str(tmp_path / "m.tchvp")
    export_lib.save_artifact(path, exported, w, meta={"model": "hybrid"})
    assert os.path.getsize(path) > 0

    m = export_lib.load_artifact(path)
    assert m.meta["meta"]["model"] == "hybrid"
    for b, seed in ((1, 0), (3, 1)):  # symbolic batch dim: any size works
        raw = _batch(b, seed)
        got = m(raw)
        want = model.apply(vs, pipeline.preprocess_clip(raw, SIZE))[1]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=1e-6,
        )


def test_static_batch_rejects_other_sizes(hybrid, tmp_path):
    model, vs = hybrid
    exported, w = export_lib.export_video_model(
        model, vs, clip_len=CLIP_LEN, image_size=SIZE, symbolic_batch=False
    )
    path = str(tmp_path / "static.tchvp")
    export_lib.save_artifact(path, exported, w)
    m = export_lib.load_artifact(path)
    m(_batch(1))  # the traced size works
    with pytest.raises(ValueError):
        m(_batch(2))  # any other size must be rejected, not retraced


def test_version_mismatch_rejected(hybrid, tmp_path, monkeypatch):
    model, vs = hybrid
    exported, w = export_lib.export_video_model(
        model, vs, clip_len=CLIP_LEN, image_size=SIZE, symbolic_batch=False
    )
    path = str(tmp_path / "v.tchvp")
    monkeypatch.setattr(export_lib, "ARTIFACT_VERSION", 99)
    export_lib.save_artifact(path, exported, w)
    monkeypatch.undo()
    with pytest.raises(ValueError, match="artifact version"):
        export_lib.load_artifact(path)


def test_export_serving_generic_fn(tmp_path):
    """export_serving works for arbitrary (weights, batch) functions —
    e.g. the int8 engine's apply — not just the flagship wrapper."""
    w = {"scale": jnp.float32(3.0), "bias": jnp.ones((4,), jnp.float32)}

    def fn(weights, x):
        return x * weights["scale"] + weights["bias"]

    x = jnp.zeros((2, 4), jnp.float32)
    exported, weights = export_lib.export_serving(fn, w, x)
    path = str(tmp_path / "g.tchvp")
    export_lib.save_artifact(path, exported, weights)
    m = export_lib.load_artifact(path)
    got = m(jnp.ones((5, 4), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), 4.0)


def test_int8_engine_export_roundtrip(hybrid, tmp_path):
    """A calibrated Int8Engine exports as a self-contained artifact whose
    outputs match the live engine exactly."""
    from tchvp_tpu.infer import Int8Engine

    model, vs = hybrid
    raw = _batch(2, seed=7)
    calib = pipeline.preprocess_clip(raw, SIZE, dtype=jnp.bfloat16)
    engine = Int8Engine(model, vs).calibrate([calib])
    exported, w = export_lib.export_int8_video_model(
        engine, clip_len=CLIP_LEN, image_size=SIZE
    )
    path = str(tmp_path / "int8.tchvp")
    export_lib.save_artifact(path, exported, w, meta={"int8": True})
    m = export_lib.load_artifact(path)
    got = m(raw)
    want = engine.apply(engine.qparams, calib)[1]
    # The exported program fuses preprocess+forward into one lowered unit;
    # bf16 intermediates round differently than the eager two-step
    # composition (measured max |diff| ~2e-3 on this shape).
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=4e-3
    )


def test_image_model_export_roundtrip(tmp_path):
    """export_image_model covers the per-image families: UNet masks and
    AutoEncoder reconstructions serve from artifacts with clip_len-free
    (B,H,W,3) inputs, matching the live eval-mode apply."""
    from tchvp_tpu.models import UNet

    model = UNet()
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    exported, w = export_lib.export_image_model(model, vs, image_size=SIZE)
    path = str(tmp_path / "unet.tchvp")
    export_lib.save_artifact(
        path, exported, w,
        meta={"model": "unet", "image_size": SIZE, "clip_len": 0},
    )
    m = export_lib.load_artifact(path)
    for b, seed in ((1, 0), (3, 1)):
        raw = jnp.asarray(np.random.default_rng(seed).integers(
            0, 255, (b, SIZE, SIZE, 3), dtype=np.uint8
        ))
        got = m(raw)
        want = model.apply(vs, pipeline.preprocess_images(raw, SIZE))
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=1e-6,
        )


def test_image_artifact_serves_over_http(tmp_path):
    """The daemon handles image artifacts: clip_len=0 warmup shape,
    per-image frame accounting, bucketed batches."""
    from tchvp_tpu.infer.server import post_npy, serve_artifact
    from tchvp_tpu.models import AutoEncoder

    model = AutoEncoder()
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    exported, w = export_lib.export_image_model(model, vs, image_size=SIZE)
    path = str(tmp_path / "ae.tchvp")
    export_lib.save_artifact(
        path, exported, w,
        meta={"model": "ae", "image_size": SIZE, "clip_len": 0},
    )
    srv = serve_artifact(path, port=0, buckets=(2,)).start()
    try:
        batch = np.random.default_rng(5).integers(
            0, 255, (3, SIZE, SIZE, 3), dtype=np.uint8
        )
        got = post_npy(f"http://127.0.0.1:{srv.port}/infer", batch)
        want = np.asarray(srv.model(batch), np.float32)  # recon (last output)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert srv.stats.snapshot()["frames"] == 3  # B, not B*H
    finally:
        srv.shutdown()


def test_cli_export_image_model(tmp_path, capsys):
    """`tchvp export --model unet` produces an image artifact the loader
    runs on (B,H,W,3) input."""
    from tchvp_tpu import cli

    art = str(tmp_path / "unet_cli.tchvp")
    cli.main([
        "export", "--model", "unet", "--out", art,
        "--image-size", str(SIZE),
    ])
    assert "exported unet" in capsys.readouterr().out
    m = export_lib.load_artifact(art)
    assert m.meta["meta"]["clip_len"] == 0
    out = m(np.zeros((2, SIZE, SIZE, 3), np.uint8))
    assert np.asarray(out).shape[0] == 2


def test_cli_export_then_serve(tmp_path, capsys):
    """End-to-end through the CLI: `tchvp export` then
    `tchvp infer --exported`."""
    from tchvp_tpu import cli

    art = str(tmp_path / "cli.tchvp")
    cli.main([
        "export", "--out", art, "--image-size", str(SIZE),
        "--clip-len", str(CLIP_LEN),
    ])
    assert os.path.exists(art)
    cli.main([
        "infer", "--exported", art, "--image-size", str(SIZE),
        "--clip-len", str(CLIP_LEN), "--synthetic", "2",
        "--batch-size", "2",
    ])
    out = capsys.readouterr().out
    assert "served 2 batches" in out
    assert "PSNR" in out


def test_cli_export_ema_weights(tmp_path, capsys):
    """`tchvp export --ema` ships the EMA parameter average the training
    optimizer carried, not the live params (same discovery path as
    `tchvp eval --ema`); without EMA state in the checkpoint it exits
    with a clear message."""
    from tchvp_tpu import cli
    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.train import checkpoint as ckpt
    from tchvp_tpu.train import create_train_state, ema_params, make_optimizer
    from tchvp_tpu.train.steps import make_video_train_step

    model = VideoHybridNet(config=flagship_video_config(image_size=SIZE))
    state = create_train_state(
        model,
        jnp.zeros((1, CLIP_LEN, SIZE, SIZE, 3)),
        make_optimizer(1e-2, ema_decay=0.5),
        jax.random.PRNGKey(0),
    )
    # One real step so ema != params.
    step = make_video_train_step(SIZE, loss="mse")
    state, _ = step(state, _batch(2))
    ema = ema_params(state.opt_state)
    path = ckpt.save_state(
        str(tmp_path), 1, state.params, state.opt_state, state.batch_stats
    )

    art = str(tmp_path / "ema.tchvp")
    cli.main([
        "export", "--out", art, "--image-size", str(SIZE),
        "--clip-len", str(CLIP_LEN), "--checkpoint", path, "--ema",
    ])
    m = export_lib.load_artifact(art)
    # The artifact's weights must be the EMA tree, not the live params.
    leaf = lambda t: np.asarray(  # noqa: E731
        jax.tree.leaves(t)[0]
    )
    got = leaf(m._weights["params"])
    np.testing.assert_allclose(got, leaf(ema), atol=1e-6)
    assert not np.allclose(got, leaf(state.params)), "exported live params"

    plain = create_train_state(
        model,
        jnp.zeros((1, CLIP_LEN, SIZE, SIZE, 3)),
        make_optimizer(1e-2),
        jax.random.PRNGKey(0),
    )
    path2 = ckpt.save_state(
        str(tmp_path / "plain"), 1, plain.params, plain.opt_state,
        plain.batch_stats,
    )
    with pytest.raises(SystemExit, match="no EMA state"):
        cli.main([
            "export", "--out", str(tmp_path / "x.tchvp"),
            "--image-size", str(SIZE), "--clip-len", str(CLIP_LEN),
            "--checkpoint", path2, "--ema",
        ])


def test_streaming_artifact_matches_stream_clip(tmp_path):
    """export_streaming_step is EXACTLY stream_clip's scan body: driving
    the loaded artifact chunk by chunk (carry threaded through step())
    reproduces stream_clip over the whole clip."""
    import numpy as np

    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.data.pipeline import preprocess_clip
    from tchvp_tpu.infer import export as export_lib
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.models.streaming import stream_clip

    size, chunk_len, ctx = 32, 2, 1
    model = VideoHybridNet(config=flagship_video_config(image_size=size))
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, chunk_len, size, size, 3)))

    exported, w = export_lib.export_streaming_step(
        model, vs, chunk_len=chunk_len, ctx_frames=ctx, image_size=size
    )
    path = str(tmp_path / "stream.tchvp")
    export_lib.save_artifact(
        path, exported, w,
        meta=export_lib.streaming_meta(
            chunk_len=chunk_len, ctx_frames=ctx, image_size=size,
            batch=1, tokens_per_frame=model.config.tokens_per_frame,
        ),
    )
    m = export_lib.load_artifact(path)
    assert isinstance(m, export_lib.StreamingServingModel)

    clip = np.random.default_rng(0).integers(
        0, 255, (1, 4, size, size, 3), dtype=np.uint8
    )
    want = stream_clip(
        model, vs, preprocess_clip(jnp.asarray(clip), size),
        chunk_len, ctx_frames=ctx,
    )
    carry = m.init_carry()
    outs = []
    for start in range(0, 4, chunk_len):
        carry, recon = m.step(carry, clip[:, start:start + chunk_len])
        outs.append(np.asarray(recon))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-5)

    with pytest.raises(TypeError, match="streaming artifact"):
        m(clip)


def test_int8_streaming_artifact(tmp_path):
    """export --streaming --int8: the carry step runs through the
    calibrated Int8Engine; chunked int8 serving stays faithful to the fp
    streaming path (>= 25 dB on random data) and threads its carry."""
    import numpy as np

    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.data.pipeline import preprocess_clip
    from tchvp_tpu.infer import Int8Engine
    from tchvp_tpu.infer import export as export_lib
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.models.streaming import stream_clip

    size, chunk_len, ctx = 32, 2, 1
    model = VideoHybridNet(
        config=flagship_video_config(image_size=size), dtype=jnp.bfloat16
    )
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, chunk_len, size, size, 3)))
    clip = np.random.default_rng(0).integers(
        0, 255, (1, 4, size, size, 3), dtype=np.uint8
    )
    calib = preprocess_clip(jnp.asarray(clip[:, :chunk_len]), size,
                            dtype=jnp.bfloat16)
    engine = Int8Engine(model, vs).calibrate([calib])

    exported, w = export_lib.export_int8_streaming_step(
        engine, chunk_len=chunk_len, ctx_frames=ctx, image_size=size
    )
    path = str(tmp_path / "sq.tchvp")
    export_lib.save_artifact(path, exported, w, meta={
        "int8": True,
        **export_lib.streaming_meta(
            chunk_len=chunk_len, ctx_frames=ctx, image_size=size,
            batch=1, tokens_per_frame=model.config.tokens_per_frame,
        ),
    })
    m = export_lib.load_artifact(path)
    assert isinstance(m, export_lib.StreamingServingModel)

    carry = m.init_carry()
    outs = []
    for start in range(0, 4, chunk_len):
        new_carry, recon = m.step(carry, clip[:, start:start + chunk_len])
        assert not np.array_equal(np.asarray(new_carry), np.asarray(carry))
        carry = new_carry
        outs.append(np.asarray(recon, np.float32))
    got = np.concatenate(outs, axis=1)

    want = np.asarray(stream_clip(
        model, vs, preprocess_clip(jnp.asarray(clip), size, dtype=jnp.bfloat16),
        chunk_len, ctx_frames=ctx,
    ), np.float32)
    mse = float(np.mean((got - want) ** 2))
    rng_ = float(want.max() - want.min())
    psnr = 20 * np.log10(max(rng_, 1e-9)) - 10 * np.log10(max(mse, 1e-12))
    assert psnr >= 25.0, f"int8 streaming fidelity too low: {psnr:.1f} dB"
