"""Quantization-aware training (tchvp_tpu/train/qat.py).

Pins: the fake-quant forward IS the int8 serving engine's math (single
conv/dense parity against Int8Engine on identical scales), STE gradients
flow to both weights and inputs, the video train step runs under
``qat=True`` with the interceptor ATTESTED (dispatch-trace marker — the
test fails if the fake-quant path silently falls back), and exclusions
stay in fp.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tchvp_tpu.config import ResNetAEConfig, TransformerConfig, VideoModelConfig
from tchvp_tpu.infer import Int8Engine
from tchvp_tpu.models import VideoHybridNet
from tchvp_tpu.ops import dispatch_trace
from tchvp_tpu.train.qat import fake_quant, qat_fake_quant, ste_round
from tchvp_tpu.train.state import create_train_state, make_optimizer
from tchvp_tpu.train.steps import make_video_train_step


class OneConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(4, (3, 3), padding="SAME", name="c")(x)


class OneDense(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(6, name="d")(x)


def tiny_video_model(size=32):
    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(layers=(1, 1), token_latent=True),
        temporal=TransformerConfig(
            input_dim=(size // 4) ** 2, hidden_dim=16, num_layers=1, num_heads=4
        ),
    )
    return VideoHybridNet(config=cfg)


def test_fake_quant_conv_matches_int8_engine():
    """Single conv: the QAT forward == the serving engine's output.

    With one layer the engine's calibrated activation scale (max|x|/127
    over the calibration batch) equals QAT's dynamic per-batch scale, so
    the two paths compute the same dequantized conv bit-for-bit up to
    fp32 rounding of the scale multiplies."""
    m = OneConv()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32)
    )
    variables = m.init(jax.random.PRNGKey(0), x)

    eng = Int8Engine(m, variables, apply_kwargs={}).calibrate([x])
    want = np.asarray(eng.apply(eng.qparams, x))

    with qat_fake_quant():
        got = np.asarray(m.apply(variables, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fake_quant_dense_matches_int8_engine():
    m = OneDense()
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(3, 5)).astype(np.float32)
    )
    variables = m.init(jax.random.PRNGKey(0), x)

    eng = Int8Engine(
        m, variables, apply_kwargs={}, quantize_dense=True
    ).calibrate([x])
    want = np.asarray(eng.apply(eng.qparams, x))

    with qat_fake_quant(dense=True):
        got = np.asarray(m.apply(variables, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ste_round_and_fake_quant_gradients():
    """STE: the rounding is identity in the backward; fake_quant passes
    unit gradient inside the clip range and the scale carries none."""
    g = jax.grad(lambda x: jnp.sum(ste_round(x)))(jnp.asarray([0.2, 1.7, -3.4]))
    np.testing.assert_allclose(np.asarray(g), 1.0)

    x = jnp.asarray([0.5, -0.25, 0.8])
    gx = jax.grad(lambda x: jnp.sum(fake_quant(x, jnp.float32(0.01))))(x)
    np.testing.assert_allclose(np.asarray(gx), 1.0)


def test_qat_gradients_reach_conv_weights():
    """value_and_grad through the interceptor: finite, nonzero kernel
    grads (the STE path), and the loss equals the fake-quant forward."""
    m = OneConv()
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 8, 8, 3)).astype(np.float32)
    )
    variables = m.init(jax.random.PRNGKey(0), x)

    def loss(params):
        with qat_fake_quant():
            out = m.apply({"params": params}, x)
        return jnp.mean(out**2)

    val, grads = jax.value_and_grad(loss)(variables["params"])
    gk = np.asarray(grads["c"]["kernel"])
    assert np.isfinite(val) and np.all(np.isfinite(gk))
    assert np.abs(gk).max() > 0
    # The gradient is against the QUANTIZED surface, not the fp one.
    fp_grads = jax.grad(
        lambda p: jnp.mean(m.apply({"params": p}, x) ** 2)
    )(variables["params"])
    assert not np.allclose(gk, np.asarray(fp_grads["c"]["kernel"]))


def test_qat_exclude_keeps_fp():
    m = OneConv()
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 8, 8, 3)).astype(np.float32)
    )
    variables = m.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m.apply(variables, x))
    with qat_fake_quant(exclude=("c",)):
        got = np.asarray(m.apply(variables, x))
    np.testing.assert_allclose(got, want)


def test_video_train_step_qat_attested():
    """The full video train step under qat=True: marker proves the
    fake-quant cores traced, loss is finite, params move, and the step
    differs from the fp step (the quantization is real)."""
    size, model = 32, tiny_video_model(32)
    clip = jnp.asarray(
        np.random.default_rng(4).integers(0, 255, (2, 2, size, size, 3)),
        jnp.uint8,
    )
    example = jnp.zeros((1, 2, size, size, 3), jnp.float32)

    def fresh_state():
        return create_train_state(
            model, example, make_optimizer(1e-3), jax.random.PRNGKey(0)
        )

    qstep = make_video_train_step(size, loss="mse", qat=True, qat_dense=True)
    with dispatch_trace.capture() as seen:
        qstate, qmetrics = qstep(fresh_state(), clip)
        jax.block_until_ready(qmetrics["loss"])
    assert "qat_fake_quant" in seen, f"QAT conv path not engaged: {sorted(seen)}"
    assert "qat_fake_quant_dense" in seen
    assert np.isfinite(float(qmetrics["loss"]))

    before = fresh_state().params
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), before, qstate.params
    )
    assert max(jax.tree.leaves(moved)) > 0

    fstep = make_video_train_step(size, loss="mse")
    _, fmetrics = fstep(fresh_state(), clip)
    assert float(qmetrics["loss"]) != float(fmetrics["loss"])


def test_qat_checkpoint_serves_through_int8_engine():
    """The QAT deliverable: a qat-trained state drops straight into the
    UNCHANGED Int8Engine serving path."""
    size, model = 32, tiny_video_model(32)
    clip_u8 = jnp.asarray(
        np.random.default_rng(5).integers(0, 255, (2, 2, size, size, 3)),
        jnp.uint8,
    )
    example = jnp.zeros((1, 2, size, size, 3), jnp.float32)
    state = create_train_state(
        model, example, make_optimizer(1e-3), jax.random.PRNGKey(0)
    )
    step = make_video_train_step(size, loss="mse", qat=True)
    for _ in range(2):
        state, metrics = step(state, clip_u8)
    assert np.isfinite(float(metrics["loss"]))

    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    clip = clip_u8.astype(jnp.float32) / 255.0
    eng = Int8Engine(model, variables).calibrate([clip])
    psnr = eng.psnr_vs(clip)
    assert np.isfinite(psnr) and psnr > 10.0
