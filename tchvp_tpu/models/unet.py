"""Classic 4-down/4-up UNet (reference ``UNet.py:6-66``).

conv-BN-ReLU double blocks, ConvTranspose(k2,s2) upsampling, sigmoid 1-ch
head — NHWC, with optional cross-replica BatchNorm for pjit training.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tchvp_tpu.config import UNetConfig
from tchvp_tpu.ops.basic import max_pool_2x2
from tchvp_tpu.ops.blocks import ConvBNReLUBlock


class UNet(nn.Module):
    config: UNetConfig = UNetConfig()
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, deterministic: bool = True
    ) -> jnp.ndarray:
        # ``deterministic`` accepted for train-step uniformity; UNet has no
        # stochastic layers (reference UNet.py has no dropout either).
        f = self.config.init_features
        dt, pdt = self.dtype, self.param_dtype

        def block(features: int, name: str) -> ConvBNReLUBlock:
            return ConvBNReLUBlock(
                features=features,
                bn_axis_name=self.bn_axis_name,
                name=name,
                dtype=dt,
                param_dtype=pdt,
            )

        def upconv(features: int, name: str) -> nn.ConvTranspose:
            # Not PixelShuffleUpconv: numerics-identical but measured
            # slower (materialized depth-to-space transpose; BENCHES.md).
            return nn.ConvTranspose(
                features,
                kernel_size=(2, 2),
                strides=(2, 2),
                name=name,
                dtype=dt,
                param_dtype=pdt,
            )

        enc1 = block(f, "encoder1")(x, train)
        enc2 = block(f * 2, "encoder2")(max_pool_2x2(enc1), train)
        enc3 = block(f * 4, "encoder3")(max_pool_2x2(enc2), train)
        enc4 = block(f * 8, "encoder4")(max_pool_2x2(enc3), train)
        bottleneck = block(f * 16, "bottleneck")(max_pool_2x2(enc4), train)

        dec4 = upconv(f * 8, "upconv4")(bottleneck)
        dec4 = block(f * 8, "decoder4")(jnp.concatenate([dec4, enc4], -1), train)
        dec3 = upconv(f * 4, "upconv3")(dec4)
        dec3 = block(f * 4, "decoder3")(jnp.concatenate([dec3, enc3], -1), train)
        dec2 = upconv(f * 2, "upconv2")(dec3)
        dec2 = block(f * 2, "decoder2")(jnp.concatenate([dec2, enc2], -1), train)
        dec1 = upconv(f, "upconv1")(dec2)
        dec1 = block(f, "decoder1")(jnp.concatenate([dec1, enc1], -1), train)

        out = nn.Conv(
            self.config.out_channels,
            kernel_size=(1, 1),
            name="conv",
            dtype=dt,
            param_dtype=pdt,
        )(dec1)
        return nn.sigmoid(out)
