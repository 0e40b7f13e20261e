"""Composed image->image->mask model (reference ``AE_Unet_Combined.py:6-17``).

AutoEncoder reconstructs the frame, UNet segments the reconstruction;
returns ``(latent, reconstruction, mask)``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from tchvp_tpu.config import AutoEncoderConfig, UNetConfig
from tchvp_tpu.models.autoencoder import AutoEncoder
from tchvp_tpu.models.unet import UNet


class Image2Image2Mask(nn.Module):
    ae_config: AutoEncoderConfig = AutoEncoderConfig()
    unet_config: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.image2image_ae = AutoEncoder(
            config=self.ae_config, dtype=self.dtype, param_dtype=self.param_dtype
        )
        self.unet = UNet(
            config=self.unet_config, dtype=self.dtype, param_dtype=self.param_dtype
        )

    def __call__(
        self, x: jnp.ndarray, train: bool = False, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        latent, recon = self.image2image_ae(x, deterministic=deterministic)
        mask = self.unet(recon, train=train)
        return latent, recon, mask
