"""Quantization-aware training (QAT): fake-int8 convs/denses in the
jitted train step.

The int8 PTQ serving engine (:mod:`tchvp_tpu.infer.quant`) is the
measured fast path for the conv-heavy video models (BENCHES.md: flagship
1.34x). PTQ's fidelity ceiling is set by training-time statistics that
never saw quantization; QAT closes that gap the standard way — the
forward pass QUANTIZES-AND-DEQUANTIZES every conv input and kernel with
the exact arithmetic the serving engine will use (symmetric int8,
per-output-channel weight scales, per-tensor activation scales), while
gradients flow through the rounding with the straight-through estimator
(STE: ``x + stop_gradient(round(x) - x)``). The optimizer therefore
updates fp32 master weights against the int8-constrained loss surface,
and the resulting checkpoint serves through the UNCHANGED
:class:`~tchvp_tpu.infer.quant.Int8Engine`.

The reference has no quantization anywhere (pure fp32 PyTorch,
``requirements.txt:1-12``); this is a build-new serving-accuracy
subsystem, the training-side complement of round 2's PTQ engine.

Faithfulness to the serving engine (pinned by ``tests/test_qat.py``):

* weights: per-output-channel scale ``max|W[..., oc]| / 127``, the same
  formula as :func:`tchvp_tpu.infer.quant.quantize_conv_params`;
* activations: per-tensor ``max|x| / 127`` — computed PER BATCH inside
  the graph during training (self-calibrating; the serving engine
  freezes the same statistic over calibration batches);
* conv runs in fp on the fake-quantized values, which is bitwise the
  dequantized int32 result: ``conv(q_x, q_w) * s_x * s_w ==
  conv(q_x * s_x, q_w * s_w)`` by bilinearity, so the train-time forward
  IS the serving forward up to bf16 casting;
* bias and BatchNorm/ReLU stay fp — exactly like the engine.

Integration is the same zero-model-edit flax method interceptor the PTQ
engine uses: wrap the forward in :func:`qat_fake_quant` (the train steps
take ``qat=True`` / CLI ``--qat``), and every ``nn.Conv``
(+ ``nn.Dense`` with ``dense=True``) call is replaced.
"""

from __future__ import annotations

import contextlib
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tchvp_tpu.ops import dispatch_trace
from tchvp_tpu.infer.quant import (
    _conv_interceptor,
    _is_dense,
    _pad_of,
    _path_key,
)


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """round(x) in the forward, identity in the backward (STE)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quant(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 quantize-dequantize with an STE backward.

    ``scale`` broadcasts against ``x`` (scalar for activations,
    per-output-channel for kernels) and carries no gradient (standard
    max-calibrated QAT; learned-scale variants would drop the
    stop_gradient on ``scale``)."""
    scale = jax.lax.stop_gradient(scale)
    q = jnp.clip(ste_round(x / scale), -127.0, 127.0)
    return q * scale


def _act_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor activation scale max|x|/127, guarded for all-zero x."""
    m = jnp.max(jnp.abs(x))
    return jnp.where(m > 0, m, 127.0) / 127.0


def _kernel_scale(w: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel kernel scale — the serving engine's formula
    (infer/quant.py::quantize_conv_params)."""
    s = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
    return jnp.where(s > 0, s, 1.0)


def _fq_conv(module: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    """One nn.Conv call on fake-quantized input and kernel (fp math on
    dequantized values == the serving engine's dequantized int32 conv)."""
    dispatch_trace.record("qat_fake_quant")
    w = module.variables["params"]["kernel"].astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    xq = fake_quant(x32, _act_scale(x32))
    wq = fake_quant(w, _kernel_scale(w))

    def _pair(v):
        if v is None:
            return (1, 1)
        return (v, v) if isinstance(v, int) else tuple(v)

    dn = jax.lax.conv_dimension_numbers(
        xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC")
    )
    out = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=_pair(module.strides),
        padding=_pad_of(module),
        dimension_numbers=dn,
        lhs_dilation=_pair(module.input_dilation),
        rhs_dilation=_pair(module.kernel_dilation),
        feature_group_count=module.feature_group_count,
    )
    if module.use_bias:
        out = out + module.variables["params"]["bias"].astype(jnp.float32)
    return out.astype(module.dtype or x.dtype)


def _fq_dense(module: nn.Dense, x: jnp.ndarray) -> jnp.ndarray:
    """One nn.Dense call on fake-quantized input and kernel."""
    dispatch_trace.record("qat_fake_quant_dense")
    w = module.variables["params"]["kernel"].astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    xq = fake_quant(x32, _act_scale(x32))
    wq = fake_quant(w, _kernel_scale(w))
    out = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ()))
    )
    if module.use_bias:
        out = out + module.variables["params"]["bias"].astype(jnp.float32)
    return out.astype(module.dtype or x.dtype)


@contextlib.contextmanager
def qat_fake_quant(dense: bool = False, exclude: Sequence[str] = ()):
    """Context manager: every ``nn.Conv`` (+ ``nn.Dense`` when ``dense``)
    call inside runs on fake-quantized input/kernel with STE gradients.

    Composes with any flax apply — wrap the forward inside a jitted train
    step (the interceptor applies at trace time):

    >>> with qat_fake_quant():
    ...     out, mut = model.apply(variables, x, mutable=["batch_stats"],
    ...                            train=True, rngs=rngs)

    ``exclude``: module-path substrings to keep in fp (mirror of
    ``Int8Engine(exclude=...)`` — exclude the same layers in both).
    During ``model.init`` the interceptor defers to the real module so
    parameters initialize normally.
    """
    exclude = tuple(exclude)

    def fq(next_fn, module, x, **kw):
        if module.is_initializing():
            return next_fn(x, **kw)
        if exclude and any(e in _path_key(module) for e in exclude):
            return next_fn(x, **kw)
        if _is_dense(module):
            return _fq_dense(module, x)
        return _fq_conv(module, x)

    with _conv_interceptor(fq, dense=dense):
        yield
