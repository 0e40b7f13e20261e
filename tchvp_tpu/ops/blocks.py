"""Conv building blocks: UNet double-conv, AE encoder/decoder, ResNet bottleneck.

Capability-equivalent NHWC redesigns of:
* ``UNet._block`` (reference ``UNet.py:54-66``) — conv-BN-ReLU x2;
* ``EncoderBlock``/``DecoderBlock``/``DeepSupervisionBlock``
  (reference ``AutoEncoder.py:5-68``) — the multi-scale-input conv AE blocks;
* ``Bottleneck`` (recovered reference ``AE_32K.py`` L20-52) — ResNet
  bottleneck with expansion 4.

BatchNorm follows torch defaults (momentum 0.1 -> flax momentum 0.9,
eps 1e-5). ``bn_axis_name`` enables cross-replica (sync) batch stats under
pjit — a decision the single-device reference never had to make
(survey §7.4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tchvp_tpu.ops.basic import max_pool_2x2, upsample2x_nearest


class BatchNorm(nn.Module):
    """Torch-default BatchNorm with optional cross-replica stat sync.

    ``use_running_average`` can be overridden per call, so setup-built
    modules can switch train/eval without reconstructing."""

    use_running_average: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, use_running_average: Optional[bool] = None
    ) -> jnp.ndarray:
        ura = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class ConvBNReLUBlock(nn.Module):
    """conv3x3-BN-ReLU x2, bias-free convs (reference ``UNet.py:54-66``)."""

    features: int
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in (1, 2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding="SAME",
                use_bias=False,
                name=f"conv{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
            x = BatchNorm(
                use_running_average=not train,
                axis_name=self.bn_axis_name,
                name=f"norm{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
            x = nn.relu(x)
        return x


def _conv3x3(features: int, name: str, dtype, param_dtype) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        padding="SAME",
        name=name,
        dtype=dtype,
        param_dtype=param_dtype,
    )


class EncoderBlock(nn.Module):
    """Multi-scale-input conv encoder block (reference ``AutoEncoder.py:5-27``).

    ``blk`` in {"first", "bottleneck"}: conv1_a -> relu -> conv2 -> relu.
    Otherwise a downscaled raw image is injected via conv1_b and
    channel-concatenated before conv2 -> conv3.
    Both paths end with dropout -> 2x2 maxpool.
    """

    blk: str
    in_channels: int
    out_channels: int
    dropout_rate: float = 0.3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        scale_img: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        dt, pdt = self.dtype, self.param_dtype
        if self.blk in ("first", "bottleneck"):
            x1 = nn.relu(_conv3x3(self.out_channels, "conv1_a", dt, pdt)(x))
            x1 = nn.relu(_conv3x3(self.out_channels, "conv2", dt, pdt)(x1))
        else:
            skip_x = nn.relu(_conv3x3(self.in_channels, "conv1_b", dt, pdt)(scale_img))
            x1 = jnp.concatenate([skip_x, x], axis=-1)
            x1 = nn.relu(_conv3x3(self.out_channels, "conv2", dt, pdt)(x1))
            x1 = nn.relu(_conv3x3(self.out_channels, "conv3", dt, pdt)(x1))
        x1 = nn.Dropout(self.dropout_rate)(x1, deterministic=deterministic)
        return max_pool_2x2(x1)


class DecoderBlock(nn.Module):
    """Upsample2x -> three conv-relu -> dropout (reference ``AutoEncoder.py:32-48``)."""

    out_channels: int
    dropout_rate: float = 0.3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dt, pdt = self.dtype, self.param_dtype
        x1 = upsample2x_nearest(x)
        x1 = nn.relu(_conv3x3(self.out_channels, "conv1", dt, pdt)(x1))
        x1 = nn.relu(_conv3x3(self.out_channels, "conv2", dt, pdt)(x1))
        x1 = nn.relu(_conv3x3(self.out_channels, "conv3", dt, pdt)(x1))
        return nn.Dropout(self.dropout_rate)(x1, deterministic=deterministic)


class DeepSupervisionBlock(nn.Module):
    """Output head: upsample -> conv-relu x2 -> conv -> final activation.

    Reference ``AutoEncoder.py:53-68`` ends in ReLU; the notebook variant
    (ipynb cell 4 L63) and ``FCT.DS_out`` (``FCT.py:191-206``) end in
    sigmoid — selectable via ``final_activation``.
    """

    in_channels: int
    out_channels: int
    final_activation: str = "relu"  # "relu" | "sigmoid"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt, pdt = self.dtype, self.param_dtype
        x1 = upsample2x_nearest(x)
        x1 = nn.relu(_conv3x3(self.in_channels, "conv1", dt, pdt)(x1))
        x1 = nn.relu(_conv3x3(self.in_channels, "conv2", dt, pdt)(x1))
        out = _conv3x3(self.out_channels, "conv3", dt, pdt)(x1)
        if self.final_activation == "sigmoid":
            return nn.sigmoid(out)
        return nn.relu(out)


class Bottleneck(nn.Module):
    """ResNet bottleneck, expansion 4 (recovered ``AE_32K.py`` L20-52).

    1x1 -> 3x3(stride) -> 1x1(x4) convs with BN; optional 1x1-conv+BN
    downsample on the residual path.
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt, pdt = self.dtype, self.param_dtype

        def bn(name: str):
            return BatchNorm(
                use_running_average=not train,
                axis_name=self.bn_axis_name,
                name=name,
                dtype=dt,
                param_dtype=pdt,
            )

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1",
                      dtype=dt, param_dtype=pdt)(x)
        out = nn.relu(bn("bn1")(out))
        # Explicit symmetric padding: XLA's SAME pads (0, 1) at stride 2,
        # torch's padding=1 pads (1, 1) — symmetric keeps weight-level
        # parity with the reference (AE_32K L26 uses padding=1).
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
                      dtype=dt, param_dtype=pdt)(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      name="conv3", dtype=dt, param_dtype=pdt)(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * self.expansion,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
                dtype=dt,
                param_dtype=pdt,
            )(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class PixelShuffleUpconv(nn.Module):
    """ConvTranspose(k2, s2) computed as matmul + depth-to-space.

    A 2x2-stride-2 transposed conv has non-overlapping taps, so it is
    EXACTLY out[2i+di, 2j+dj, f] = sum_c x[i,j,c] * K[di,dj,c,f] + b[f]
    (the polyphase identity, kernels/fused_tail.py:78). XLA lowers
    ``nn.ConvTranspose`` through zero-inserted/gradient convolutions that
    leave the MXU badly under-tiled at these shapes — measured 74.5
    TFLOP/s AND only 242 GB/s for the flagship decoder (neither roof,
    benchmarks/stage_times.py). This module does the same math as one
    dense (C -> 4F) matmul at the LOW resolution plus a free reshape.

    Parameter tree is IDENTICAL to ``nn.ConvTranspose(F, (2,2), (2,2))``
    — kernel (2, 2, C, F) + bias (F,), same initializers — so it is a
    drop-in swap: checkpoints transfer both ways and the torch-parity
    mapping (kernel spatially flipped vs torch) is unchanged.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax  # local: blocks.py otherwise only needs jnp

        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, c, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )
        dt = self.dtype
        # flax ConvTranspose applies the kernel spatially FLIPPED relative
        # to the gather view above (verified numerically vs
        # nn.ConvTranspose in tests/test_model_shapes.py).
        w = jnp.flip(kernel, (0, 1)).astype(dt)
        w = jnp.transpose(w, (2, 0, 1, 3)).reshape(c, 4 * self.features)
        b_, h, wd = x.shape[0], x.shape[1], x.shape[2]
        y = jax.lax.dot_general(
            x.astype(dt), w, (((3,), (0,)), ((), ())),
            preferred_element_type=dt,
        )  # (B, H, W, 4F)
        y = y.reshape(b_, h, wd, 2, 2, self.features)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            b_, 2 * h, 2 * wd, self.features
        )
        return y + bias.astype(dt)
