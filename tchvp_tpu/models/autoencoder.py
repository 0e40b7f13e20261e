"""Plain conv autoencoder (reference ``AutoEncoder.py:73-134``).

Five-stage multi-scale-input encoder (filters 8..128 -> latent
(B, 8, 8, 128) at 256^2 NHWC) and the notebook's deeper variant
(filters 8..512 -> latent (B, 4, 4, 512), ipynb cell 4). Returns
``(latent, reconstruction)`` like the reference forward
(``AutoEncoder.py:131-134``).

The reference computes an unused ``scale_img_5`` (``AutoEncoder.py:92``);
omitted here per the survey §7.5 quirk registry.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tchvp_tpu.config import AutoEncoderConfig
from tchvp_tpu.ops.basic import avg_pool_2x2
from tchvp_tpu.ops.blocks import DecoderBlock, DeepSupervisionBlock, EncoderBlock


class Encoder(nn.Module):
    """Multi-scale-input conv encoder (reference ``AutoEncoder.py:73-99``)."""

    filters: Sequence[int] = (8, 16, 32, 64, 128)
    dropout_rate: float = 0.3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        f = list(self.filters)
        n = len(f)
        in_ch = x.shape[-1]

        def block(i: int, blk: str, cin: int) -> EncoderBlock:
            return EncoderBlock(
                blk=blk,
                in_channels=cin,
                out_channels=f[i],
                dropout_rate=self.dropout_rate,
                name=f"block_{i + 1}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )

        # Image pyramid for the middle blocks (AutoEncoder.py:89-92).
        scale_imgs = []
        s = x
        for _ in range(n - 2):
            s = avg_pool_2x2(s)
            scale_imgs.append(s)

        h = block(0, "first", in_ch)(x, deterministic=deterministic)
        for i in range(1, n - 1):
            h = block(i, "middle", f[i - 1])(
                h, scale_imgs[i - 1], deterministic=deterministic
            )
        h = block(n - 1, "bottleneck", f[n - 2])(h, deterministic=deterministic)
        return h


class Decoder(nn.Module):
    """Mirrored conv decoder (reference ``AutoEncoder.py:103-121``)."""

    filters: Sequence[int] = (8, 16, 32, 64, 128)
    out_channels: int = 3
    dropout_rate: float = 0.3
    final_activation: str = "relu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        rev = list(self.filters)[::-1]
        for i in range(len(rev) - 1):
            x = DecoderBlock(
                out_channels=rev[i + 1],
                dropout_rate=self.dropout_rate,
                name=f"block_{len(rev) - 1 - i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x, deterministic=deterministic)
        return DeepSupervisionBlock(
            in_channels=rev[-1],
            out_channels=self.out_channels,
            final_activation=self.final_activation,
            name="ds",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class AutoEncoder(nn.Module):
    """(latent, reconstruction) conv AE (reference ``AutoEncoder.py:125-134``)."""

    config: AutoEncoderConfig = AutoEncoderConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            filters=self.config.filters,
            dropout_rate=self.config.dropout_rate,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.decoder = Decoder(
            filters=self.config.filters,
            out_channels=self.config.out_channels,
            dropout_rate=self.config.dropout_rate,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        latent = self.encoder(x, deterministic=deterministic)
        output = self.decoder(latent, deterministic=deterministic)
        return latent, output
