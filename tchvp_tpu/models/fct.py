"""FCT — Fully Convolutional Transformer U-Net (reference ``FCT.py:210-254``).

9-block conv-transformer U-Net: 5 multi-scale-input encoder blocks, 4
skip-connected decoder blocks, deep-supervision sigmoid head. Every block
ends in a :class:`~tchvp_tpu.ops.conv_attention.SpatialTransformer` whose
H*W-token attention is the hot spot that routes to the Pallas
flash-attention kernel (``attn_impl="flash"``).

Stochastic depth: ``FCTConfig.stochastic_depth_rate`` drives the
reference's linspace schedule (``FCT.py:217-218``) into real per-block
drop-path on the transformer residuals — the reference computes ``dpr``
but never consumes it (``FCT.py:82``); rate 0.0 (the default) matches the
reference exactly.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tchvp_tpu.config import FCTConfig
from tchvp_tpu.ops.basic import avg_pool_2x2, max_pool_2x2, upsample2x_nearest
from tchvp_tpu.ops.conv_attention import SpatialTransformer
from tchvp_tpu.parallel.tp import conv_constrain


def _conv3x3(features: int, name: str, dtype, param_dtype) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        padding="SAME",
        name=name,
        dtype=dtype,
        param_dtype=param_dtype,
    )


class BlockEncoderBottleneck(nn.Module):
    """FCT encoder/bottleneck block (reference ``FCT.py:136-162``)."""

    blk: str
    in_channels: int
    out_channels: int
    att_heads: int
    dropout_rate: float = 0.3
    attn_impl: str = "xla"
    drop_path_rate: float = 0.0
    seq_axis: Optional[str] = None
    sp_axis: Optional[str] = None
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
        # Spatial partitioning: image rows stay sharded over sp_axis
        # through the conv stages (parallel/tp.py::conv_constrain —
        # GSPMD halo exchanges; no-op without a mesh / indivisible H).
        sp = lambda t: conv_constrain(t, sp_axis=self.sp_axis)  # noqa: E731
        if self.blk in ("first", "bottleneck"):
            x1 = sp(nn.relu(_conv3x3(self.out_channels, "conv1_a", dt, pdt)(x)))
            x1 = sp(nn.relu(_conv3x3(self.out_channels, "conv2", dt, pdt)(x1)))
        else:
            skip_x = nn.relu(_conv3x3(self.in_channels, "conv1_b", dt, pdt)(scale_img))
            x1 = jnp.concatenate([skip_x, x], axis=-1)
            x1 = sp(nn.relu(_conv3x3(self.out_channels, "conv2", dt, pdt)(x1)))
            x1 = sp(nn.relu(_conv3x3(self.out_channels, "conv3", dt, pdt)(x1)))
        x1 = nn.Dropout(self.dropout_rate)(x1, deterministic=deterministic)
        x1 = sp(max_pool_2x2(x1))
        return SpatialTransformer(
            channels=self.out_channels,
            num_heads=self.att_heads,
            attn_impl=self.attn_impl,
            drop_path_rate=self.drop_path_rate,
            seq_axis=self.seq_axis,
            name="trans",
            dtype=dt,
            param_dtype=pdt,
        )(x1, deterministic=deterministic)


class BlockDecoder(nn.Module):
    """FCT decoder block (reference ``FCT.py:167-186``)."""

    out_channels: int
    att_heads: int
    dropout_rate: float = 0.3
    attn_impl: str = "xla"
    drop_path_rate: float = 0.0
    seq_axis: Optional[str] = None
    sp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        dt, pdt = self.dtype, self.param_dtype
        sp = lambda t: conv_constrain(t, sp_axis=self.sp_axis)  # noqa: E731
        x1 = upsample2x_nearest(x)
        x1 = sp(nn.relu(_conv3x3(self.out_channels, "conv1", dt, pdt)(x1)))
        x1 = jnp.concatenate([skip, x1], axis=-1)
        x1 = sp(nn.relu(_conv3x3(self.out_channels, "conv2", dt, pdt)(x1)))
        x1 = sp(nn.relu(_conv3x3(self.out_channels, "conv3", dt, pdt)(x1)))
        x1 = nn.Dropout(self.dropout_rate)(x1, deterministic=deterministic)
        return SpatialTransformer(
            channels=self.out_channels,
            num_heads=self.att_heads,
            attn_impl=self.attn_impl,
            drop_path_rate=self.drop_path_rate,
            seq_axis=self.seq_axis,
            name="trans",
            dtype=dt,
            param_dtype=pdt,
        )(x1, deterministic=deterministic)


class DSOut(nn.Module):
    """Deep-supervision sigmoid head (reference ``FCT.py:191-206``)."""

    in_channels: int
    out_channels: int
    sp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt, pdt = self.dtype, self.param_dtype
        sp = lambda t: conv_constrain(t, sp_axis=self.sp_axis)  # noqa: E731
        x1 = upsample2x_nearest(x)
        x1 = sp(nn.relu(_conv3x3(self.in_channels, "conv1", dt, pdt)(x1)))
        x1 = sp(nn.relu(_conv3x3(self.in_channels, "conv2", dt, pdt)(x1)))
        return nn.sigmoid(_conv3x3(self.out_channels, "conv3", dt, pdt)(x1))


class FCT(nn.Module):
    """The 9-block FCT segmentation model (reference ``FCT.py:210-254``)."""

    config: FCTConfig = FCTConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        f = list(cfg.filters)
        heads = cfg.att_heads
        dt, pdt = self.dtype, self.param_dtype

        depth = len(f) // 2 + 1  # encoder halvings incl. bottleneck
        div = 2**depth
        if x.shape[1] % div or x.shape[2] % div:
            raise ValueError(
                f"FCT input spatial dims must be divisible by {div} "
                f"(5 encoder downsamples); got {x.shape[1]}x{x.shape[2]}"
            )

        # Per-block drop-path schedule (FCT.py:217-218 linspace).
        n = len(f)
        dpr = [
            cfg.stochastic_depth_rate * i / (n - 1) if n > 1 else 0.0
            for i in range(n)
        ]

        def enc(i: int, blk: str, cin: int) -> BlockEncoderBottleneck:
            return BlockEncoderBottleneck(
                blk=blk,
                in_channels=cin,
                out_channels=f[i],
                att_heads=heads,
                dropout_rate=cfg.dropout_rate,
                attn_impl=cfg.attn_impl,
                seq_axis=cfg.seq_axis,
                sp_axis=cfg.sp_axis,
                drop_path_rate=dpr[i],
                name=f"block_{i + 1}",
                dtype=dt,
                param_dtype=pdt,
            )

        def dec(i: int) -> BlockDecoder:
            return BlockDecoder(
                out_channels=f[i],
                att_heads=heads,
                dropout_rate=cfg.dropout_rate,
                attn_impl=cfg.attn_impl,
                seq_axis=cfg.seq_axis,
                sp_axis=cfg.sp_axis,
                drop_path_rate=dpr[i],
                name=f"block_{i + 1}",
                dtype=dt,
                param_dtype=pdt,
            )

        # Multi-scale input pyramid (FCT.py:238-240).
        scale_img_2 = avg_pool_2x2(x)
        scale_img_3 = avg_pool_2x2(scale_img_2)
        scale_img_4 = avg_pool_2x2(scale_img_3)

        x1 = enc(0, "first", x.shape[-1])(x, deterministic=deterministic)
        x2 = enc(1, "second", f[0])(x1, scale_img_2, deterministic=deterministic)
        x3 = enc(2, "third", f[1])(x2, scale_img_3, deterministic=deterministic)
        x4 = enc(3, "fourth", f[2])(x3, scale_img_4, deterministic=deterministic)
        h = enc(4, "bottleneck", f[3])(x4, deterministic=deterministic)
        h = dec(5)(h, x4, deterministic=deterministic)
        h = dec(6)(h, x3, deterministic=deterministic)
        h = dec(7)(h, x2, deterministic=deterministic)
        h = dec(8)(h, x1, deterministic=deterministic)

        return DSOut(
            in_channels=f[8],
            out_channels=cfg.out_channels,
            sp_axis=cfg.sp_axis,
            name="ds",
            dtype=dt,
            param_dtype=pdt,
        )(h)
