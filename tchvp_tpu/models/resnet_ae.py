"""ResNet-bottleneck autoencoder family (recovered reference ``AE_32K.py`` /
``AE_256_32K.py`` / ``AE_64_4k.py``, disassembled from ``__pycache__``).

* ``Encoder32K``: 7x7/s2 stem -> Bottleneck stages [3, 4] (second stride 2)
  -> 512->128->64->16->8 squeeze chain -> (B, H/4, W/4, 8) latent
  ("32K" = 8*64*64 at 256^2 input; AE_32K L57-115). ``token_latent``
  reshapes to the (B, 8, H/4*W/4) token sequence of AE_256_32K L118-119.
* ``Decoder32K``: conv chain 8->16->64->128->256, two ConvTranspose(k2,s2)
  upsamples, head switch ``output_type`` "image" (3ch+ReLU) / "mask"
  (1ch+sigmoid) (AE_32K L121-168).
* ``Autoencoder32K`` / ``Autoencoder4K``: encode -> decode
  (AE_32K L174-186, AE_64_4k L203-216). ``Autoencoder4K`` squeezes to a
  flat 4096-d latent for 64^2 inputs (AE_64_4k L62-81, L118).

The dead VAE ``reparameterize`` hook (AE_256_32K L141-147) is exposed as an
optional ``vae`` flag, default off (survey §7.5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tchvp_tpu.config import ResNetAEConfig
from tchvp_tpu.ops.blocks import BatchNorm, Bottleneck
from tchvp_tpu.parallel.tp import conv_constrain


class Encoder32K(nn.Module):
    """ResNet-style spatial compressor to an 8-channel latent map."""

    config: ResNetAEConfig = ResNetAEConfig()
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        dt, pdt = self.dtype, self.param_dtype

        def bn(name: str):
            return BatchNorm(
                use_running_average=not train,
                axis_name=self.bn_axis_name,
                name=name,
                dtype=dt,
                param_dtype=pdt,
            )

        # 7x7/s2 stem (AE_32K L65). Symmetric (3, 3) padding matches the
        # reference's torch Conv2d(padding=3); XLA's SAME would pad (2, 3)
        # at stride 2 and break weight-level parity.
        h = nn.Conv(
            cfg.stem_features,
            kernel_size=(7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            name="stem_conv",
            dtype=dt,
            param_dtype=pdt,
        )(x)
        h = nn.relu(bn("stem_bn")(h))
        # Tensor parallelism: channel dims shard over cfg.tp_axis after
        # every conv stage — GSPMD partitions each conv's output-channel
        # compute and keeps activations split between stages
        # (parallel/tp.py; no-op without a mesh carrying the axis).
        h = conv_constrain(h, cfg.tp_axis, cfg.sp_axis)

        # Bottleneck stages: planes 64 (stride 1), 128 (stride 2)
        # — ResNet-50-style _make_layer (AE_32K L68-69, L92).
        planes = cfg.stem_features
        for stage, blocks in enumerate(cfg.layers):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                first = b == 0
                h = Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    downsample=first,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage + 1}_block{b}",
                    dtype=dt,
                    param_dtype=pdt,
                )(h, train=train)
                h = conv_constrain(h, cfg.tp_axis, cfg.sp_axis)
            planes *= 2

        # Squeeze chain to the latent channel count (AE_32K L71-81). Every
        # stage is conv-BN-ReLU INCLUDING the last: the original clamps the
        # latent non-negative (proven by executing the AE_32K bytecode —
        # tests/test_reference_exec.py; round 1's replica missed this).
        for i, feat in enumerate(cfg.squeeze_features):
            h = nn.Conv(
                feat,
                kernel_size=(3, 3),
                padding="SAME",
                use_bias=False,
                name=f"squeeze{i}_conv",
                dtype=dt,
                param_dtype=pdt,
            )(h)
            h = nn.relu(bn(f"squeeze{i}_bn")(h))
            h = conv_constrain(h, cfg.tp_axis, cfg.sp_axis)

        # Channel-wise dropout == torch Dropout2d (AE_32K L84).
        h = nn.Dropout(cfg.dropout_rate, broadcast_dims=(1, 2))(
            h, deterministic=deterministic
        )
        return h


class Decoder32K(nn.Module):
    """Latent map -> image/mask decoder (AE_32K L121-168).

    Split into :meth:`body` (conv chain + first upsample, output at H/2
    resolution) and :meth:`tail` (second upsample + full-resolution convs
    + head) so the inference engine can swap the HBM-heavy tail for the
    fused Pallas kernel (``kernels/fused_tail.py``) — ``__call__`` =
    ``tail(body(x))`` and is unchanged numerically.
    """

    output_type: str = "image"  # "image" | "mask" (AE_32K L151-158)
    # Conv-chain widths before the upsamples: (16, 64, 128, 256) in
    # AE_32K (8-ch latent); the AE_64_4k variant opens at 32 from its
    # 16-ch latent (proven by executing the AE_64_4k bytecode).
    conv_features: Sequence[int] = (16, 64, 128, 256)
    # Tensor-parallel channel sharding (parallel/tp.py); the 1/3-channel
    # head auto-skips via the divisibility gate.
    tp_axis: Optional[str] = None
    # Spatial partitioning: image rows shard over this axis (halo
    # exchanges per conv) — the over-one-chip-resolution scale-out.
    sp_axis: Optional[str] = None
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt, pdt = self.dtype, self.param_dtype

        def bn(name: str) -> BatchNorm:
            return BatchNorm(
                axis_name=self.bn_axis_name, name=name, dtype=dt, param_dtype=pdt
            )

        self.convs = [
            nn.Conv(feat, (3, 3), padding="SAME", use_bias=False,
                    name=f"conv{i}", dtype=dt, param_dtype=pdt)
            for i, feat in enumerate(self.conv_features)
        ]
        self.conv_bns = [bn(f"bn{i}") for i in range(len(self.conv_features))]
        # nn.ConvTranspose, not the polyphase PixelShuffleUpconv: the
        # matmul+depth-to-space form is numerics-identical but MEASURED
        # SLOWER here (decoder 41.0 -> 49.2 ms — the depth-to-space
        # transpose materializes an extra full tensor; XLA's native
        # lowering already skips the inserted zeros). BENCHES.md.
        self.upconvs = [
            nn.ConvTranspose(feat, (2, 2), strides=(2, 2),
                             name=f"upconv{i}", dtype=dt, param_dtype=pdt)
            for i, feat in enumerate((384, 192))
        ]
        self.up_bns = [bn("up_bn0"), bn("up_bn1")]
        self.post_convs = [
            nn.Conv(feat, (3, 3), padding="SAME", use_bias=False,
                    name=f"post_conv{i}", dtype=dt, param_dtype=pdt)
            for i, feat in enumerate((64, 8))
        ]
        self.post_bns = [bn("post_bn0"), bn("post_bn1")]
        self.head_conv = nn.Conv(
            1 if self.output_type == "mask" else 3, (3, 3), padding="SAME",
            name="head_conv", dtype=dt, param_dtype=pdt,
        )
        self.head_bn = bn("head_bn")

    def body(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """conv-BN chain 8->16->64->128->256 (AE_32K L127-137) + first
        ConvTranspose 256->384 (L139-141): output (B, H*2, W*2, 384)."""
        ura = not train
        for conv, bn in zip(self.convs, self.conv_bns):
            x = nn.relu(bn(conv(x), use_running_average=ura))
            x = conv_constrain(x, self.tp_axis, self.sp_axis)
        x = self.upconvs[0](x)
        x = nn.relu(self.up_bns[0](x, use_running_average=ura))
        return conv_constrain(x, self.tp_axis, self.sp_axis)

    def tail(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Second ConvTranspose 384->192 (L142-143), conv 192->64->8
        (L145-149), image/mask head (L151-158) — the full-resolution,
        HBM-heavy stage the fused kernel replaces at inference."""
        ura = not train
        x = self.upconvs[1](x)
        x = nn.relu(self.up_bns[1](x, use_running_average=ura))
        x = conv_constrain(x, self.tp_axis, self.sp_axis)
        for conv, bn in zip(self.post_convs, self.post_bns):
            x = nn.relu(bn(conv(x), use_running_average=ura))
            x = conv_constrain(x, self.tp_axis, self.sp_axis)
        x = self.head_bn(self.head_conv(x), use_running_average=ura)
        if self.output_type == "mask":
            return nn.sigmoid(x)  # mask head (L155-158)
        return nn.relu(x)  # image head (L151-154)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.tail(self.body(x, train=train), train=train)


def latent_to_tokens(latent: jnp.ndarray) -> jnp.ndarray:
    """(B, H', W', C) -> (B, C, H'*W'): channels become tokens, spatial
    flattens to the embedding dim (AE_256_32K L118-119)."""
    b, h, w, c = latent.shape
    return jnp.transpose(latent, (0, 3, 1, 2)).reshape(b, c, h * w)


def tokens_to_latent(tokens: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, C, H'*W') -> (B, H', W', C) (AE_256_32K L194 inverse reshape)."""
    b, c, _ = tokens.shape
    h, w = hw
    return jnp.transpose(tokens.reshape(b, c, h, w), (0, 2, 3, 1))


class Autoencoder32K(nn.Module):
    """encode -> decode; returns (latent, reconstruction).

    With ``config.vae=True`` the latent is reparameterized from per-channel
    mu/logvar heads (the reference's dead hook, made functional)."""

    config: ResNetAEConfig = ResNetAEConfig()
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder32K(
            config=self.config,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.decoder = Decoder32K(
            output_type=self.config.output_type,
            tp_axis=self.config.tp_axis,
            sp_axis=self.config.sp_axis,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.config.vae:
            self.mu_head = nn.Conv(
                self.config.squeeze_features[-1], (1, 1), name="mu",
                dtype=self.dtype, param_dtype=self.param_dtype)
            self.logvar_head = nn.Conv(
                self.config.squeeze_features[-1], (1, 1), name="logvar",
                dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        latent = self.encoder(x, train=train, deterministic=deterministic)
        if self.config.vae:
            mu = self.mu_head(latent)
            logvar = self.logvar_head(latent)
            eps = jax.random.normal(self.make_rng("vae"), mu.shape, mu.dtype)
            latent = mu + jnp.exp(0.5 * logvar) * eps
        recon = self.decoder(latent, train=train)
        if self.config.token_latent:
            return latent_to_tokens(latent), recon
        return latent, recon


class Autoencoder4K(nn.Module):
    """Flat-4096-latent AE for 64^2 inputs (recovered ``AE_64_4k.py``).

    Encoder squeezes to 16 channels at 16x16 -> flat 4096-d vector (L118);
    decoder reshapes back to (16, 16, 16) (L193) and upsamples x4."""

    output_type: str = "image"
    tp_axis: Optional[str] = None
    sp_axis: Optional[str] = None
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        # Executing the AE_64_4k bytecode (tests/test_reference_exec.py)
        # pinned the real chains: encoder squeezes 512->128->64->32->16
        # (FOUR stages — round 1 recovered only three) and the decoder
        # opens its conv chain at 32 from the 16-ch latent.
        cfg = ResNetAEConfig(
            squeeze_features=(128, 64, 32, 16),
            dropout_rate=0.1,  # AE_64_4k Dropout2d 0.1
            output_type=self.output_type,
            tp_axis=self.tp_axis,
            sp_axis=self.sp_axis,
        )
        self.encoder = Encoder32K(
            config=cfg,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.decoder = Decoder32K(
            output_type=self.output_type,
            conv_features=(32, 64, 128, 256),
            tp_axis=self.tp_axis,
            sp_axis=self.sp_axis,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        latent_map = self.encoder(x, train=train, deterministic=deterministic)
        b, h, w, c = latent_map.shape
        # Channel-first flatten — the original's (C, H, W) view order
        # (AE_64_4k L118), so flat latents interchange with it exactly.
        latent = jnp.transpose(latent_map, (0, 3, 1, 2)).reshape(b, c * h * w)
        recon = self.decoder(latent_map, train=train)
        return latent, recon
