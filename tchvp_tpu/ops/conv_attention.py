"""FCT building blocks: conv-projection attention, Wide-Focus FFN, transformer.

Capability-equivalent to reference ``FCT.py:24-132``, redesigned NHWC:
* depthwise 3x3 conv q/k/v projections + LayerNorm (``FCT.py:31-36,41-57``),
* H*W spatial tokens with C-dim embedding through MHA (``FCT.py:69-75``),
* explicit (H, W) reshape instead of the reference's sqrt(H*W) square-image
  assumption (``FCT.py:77``; survey §7.4) — numerically identical for square
  inputs, and non-square inputs now work too,
* multi-dilation conv FFN ("Wide_Focus", ``FCT.py:107-132``),
* attention -> conv -> residual -> LayerNorm -> FFN -> residual block
  (``FCT.py:84-102``).

The reference's ``conv_k``/``conv_v`` receive ``padding=stride_kv`` (an
int) while ``conv_q`` gets ``padding_q`` (``FCT.py:31-35`` — ``padding_kv``
is accepted but never used); identical padding math for kernel 3 /
stride 1, and the quirk is replicated exactly for other strides
(survey §7.5 quirk registry).
"""

from __future__ import annotations

from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from tchvp_tpu.ops.attention import TorchMultiheadAttention


def _conv_padding(pad: Union[str, int]):
    if isinstance(pad, str):
        return pad.upper()
    return ((pad, pad), (pad, pad))


class ConvProjAttention(nn.Module):
    """Conv-projected spatial self-attention over NHWC feature maps.

    Full reference constructor surface (``FCT.py:25``):
    ``kernel_size``/``stride_q``/``stride_kv``/``padding_q`` shape the
    depthwise projections (a strided-projection CvT variant: fewer k/v
    tokens, output at q's spatial dims — the reference's own ``forward``
    cannot actually run strided, its ``view`` uses the input shape,
    ``FCT.py:69-77``). ``padding_kv`` is accepted for parity but unused,
    exactly like the reference, whose conv_k/conv_v take
    ``padding=stride_kv`` instead (``FCT.py:33,35`` quirk). ``proj_drop``
    is implemented as real output dropout; the reference declares it and
    comments the application out (``FCT.py:30,78``), so the default 0.0
    matches it bit-for-bit.
    """

    channels: int
    num_heads: int
    attn_impl: str = "xla"
    use_bias: bool = True  # attention_bias (FCT.py:25)
    kernel_size: int = 3
    stride_q: int = 1
    stride_kv: int = 1
    padding_q: Union[str, int] = "same"
    padding_kv: Union[str, int] = "same"  # dead in the reference too
    proj_drop: float = 0.0
    seq_axis: Optional[str] = None  # ring/context parallelism (impl="ring")
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _projection(self, x: jnp.ndarray, name: str) -> jnp.ndarray:
        c = self.channels
        if name == "q":
            stride, pad = self.stride_q, _conv_padding(self.padding_q)
        else:
            # FCT.py:33,35: conv_k/conv_v get padding=stride_kv (int).
            stride, pad = self.stride_kv, _conv_padding(self.stride_kv)
        x = nn.Conv(
            c,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(stride, stride),
            padding=pad,
            feature_group_count=c,  # depthwise, groups=channels (FCT.py:31)
            use_bias=self.use_bias,
            name=f"conv_{name}",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = nn.relu(x)
        return nn.LayerNorm(
            epsilon=1e-5,
            name=f"layernorm_{name}",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        b, h, w, c = x.shape
        q = self._projection(x, "q")
        hq, wq = q.shape[1], q.shape[2]
        q = q.reshape(b, hq * wq, c)
        k = self._projection(x, "k")
        k = k.reshape(b, k.shape[1] * k.shape[2], c)
        v = self._projection(x, "v")
        v = v.reshape(b, v.shape[1] * v.shape[2], c)
        out = TorchMultiheadAttention(
            features=c,
            num_heads=self.num_heads,
            use_bias=self.use_bias,
            impl=self.attn_impl,
            seq_axis=self.seq_axis,
            name="attention",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(q, k, v)
        out = out.reshape(b, hq, wq, c)
        if self.proj_drop > 0.0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class WideFocus(nn.Module):
    """Multi-dilation conv FFN (reference ``FCT.py:107-132``)."""

    features: int
    dropout_rate: float = 0.1  # FCT.py:115
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        def branch(dilation: int, name: str) -> jnp.ndarray:
            y = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding="SAME",
                kernel_dilation=(dilation, dilation),
                name=name,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
            y = jax.nn.gelu(y, approximate=False)
            return nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)

        added = branch(1, "conv1") + branch(2, "conv2") + branch(3, "conv3")
        out = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            padding="SAME",
            name="conv4",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(added)
        out = jax.nn.gelu(out, approximate=False)
        return nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)


def drop_path(
    rng: jax.Array, x: jnp.ndarray, rate: float
) -> jnp.ndarray:
    """Stochastic depth: zero a residual branch per-sample with prob
    ``rate``, scaling survivors by 1/(1-rate) (Huang et al. 2016)."""
    keep_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, 1.0 - rate, keep_shape)
    return x * keep.astype(x.dtype) / (1.0 - rate)


class SpatialTransformer(nn.Module):
    """Attention -> conv -> residual -> LayerNorm -> WideFocus -> residual.

    Reference ``FCT.py:84-102`` (in_channels == out_channels at every call
    site, ``FCT.py:144,174``).

    ``drop_path_rate``: stochastic depth on the two residual branches. The
    reference threads a per-block ``dpr`` into its Transformer but never
    consumes it (``FCT.py:82,217-218`` — dead plumbing at rate 0.0); here
    it is implemented for real, gating the attention and Wide-Focus
    branches per sample at train time. Rate 0.0 (the reference default) is
    exactly the reference computation.
    """

    channels: int
    num_heads: int
    attn_impl: str = "xla"
    drop_path_rate: float = 0.0
    seq_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x1 = ConvProjAttention(
            channels=self.channels,
            num_heads=self.num_heads,
            attn_impl=self.attn_impl,
            seq_axis=self.seq_axis,
            name="attention_output",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x1 = nn.Conv(
            self.channels,
            kernel_size=(3, 3),
            padding="SAME",
            name="conv1",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x1)
        sd_active = self.drop_path_rate > 0.0 and not deterministic
        if sd_active:
            x1 = drop_path(self.make_rng("dropout"), x1, self.drop_path_rate)
        x2 = x1 + x  # residual (FCT.py:96)
        x3 = nn.LayerNorm(
            epsilon=1e-5,
            name="layernorm",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x2)
        x3 = WideFocus(
            features=self.channels,
            name="wide_focus",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x3, deterministic=deterministic)
        if sd_active:
            x3 = drop_path(self.make_rng("dropout"), x3, self.drop_path_rate)
        return x2 + x3  # residual (FCT.py:101)
