"""Flagship video pipeline: per-frame CNN encoder -> temporal transformer ->
per-frame CNN decoder.

Capability-equivalent to the reference's latent video pipeline (survey
§3.5): ``DataloaderSequential`` clips -> ``Encoder_32K`` per frame ->
``TransformerEncoder`` over frame-latent tokens -> ``Decoder_32K``.
TPU-first redesign:

* Frames fold into the batch (``layout.fold_time``) so convs run as one
  large NHWC batched conv on the MXU instead of a per-frame Python loop.
* Temporal tokens are the per-frame latent channels (8 tokens x (H/4*W/4)
  dims per frame, AE_256_32K L118-119), concatenated over the clip.
* Attention routes through one op interface: einsum, Pallas flash, or
  overlapping-window for long/streaming clips.
* Optional sinusoidal positional encoding over the temporal token sequence
  (the reference's transformer has none; BASELINE.json north star asks for
  it — ``use_posenc=False`` reproduces reference behavior).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tchvp_tpu import layout
from tchvp_tpu.config import VideoModelConfig
from tchvp_tpu.models.resnet_ae import (
    Decoder32K,
    Encoder32K,
    latent_to_tokens,
    tokens_to_latent,
)
from tchvp_tpu.models.transformer import TransformerEncoder


def sinusoidal_posenc(seq_len: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Standard sinusoidal positional encoding, (seq_len, dim)."""
    position = np.arange(seq_len)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, dim, 2).astype(np.float32) * (-np.log(10000.0) / dim))
    pe = np.zeros((seq_len, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div[: pe[:, 1::2].shape[1]])
    return jnp.asarray(pe, dtype=dtype)


class VideoHybridNet(nn.Module):
    """CNN spatial compression + transformer temporal mixing + CNN decode."""

    config: VideoModelConfig = VideoModelConfig()
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        enc_cfg = self.config.encoder
        self.encoder = Encoder32K(
            config=enc_cfg,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.temporal = TransformerEncoder(
            config=self.config.temporal,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.decoder = Decoder32K(
            output_type=self.config.output_type,
            tp_axis=enc_cfg.tp_axis,
            sp_axis=enc_cfg.sp_axis,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def encode_clip(
        self,
        clip: jnp.ndarray,
        train: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Tuple[int, int]]:
        """(B, T, H, W, C) -> (tokens (B, T*tpf, D), latent (hh, ww)).

        Frames fold into the batch so the encoder runs one large NHWC conv;
        per-frame latent channels become temporal tokens (AE_256_32K
        L118-119). ``(hh, ww)`` is static shape info for decode_tokens.
        """
        b, t = clip.shape[0], clip.shape[1]
        frames = layout.fold_time(clip)  # (B*T, H, W, C)
        latent = self.encoder(frames, train=train, deterministic=deterministic)
        _, hh, ww, cc = latent.shape
        tokens = latent_to_tokens(latent)  # (B*T, C', hh*ww)
        return tokens.reshape(b, t * cc, tokens.shape[-1]), (hh, ww)

    def temporal_mix(
        self,
        tokens: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Temporal transformer over (B, S, D) tokens (+ optional posenc)."""
        if self.config.use_posenc:
            s, d = tokens.shape[-2], tokens.shape[-1]
            tokens = tokens + sinusoidal_posenc(s, d, dtype=tokens.dtype)[None]
        return self.temporal(tokens, mask=mask, deterministic=deterministic)

    def decode_tokens(
        self,
        tokens: jnp.ndarray,
        hw: Tuple[int, int],
        train: bool = False,
    ) -> jnp.ndarray:
        """(B, T*tpf, D) tokens -> (B, T, H, W, C') reconstructed frames."""
        b = tokens.shape[0]
        cc = self.config.tokens_per_frame
        t = tokens.shape[1] // cc
        latent_out = tokens_to_latent(
            tokens.reshape(b * t, cc, tokens.shape[-1]), hw
        )  # (B*T, hh, ww, C')
        recon = self.decoder(latent_out, train=train)
        return layout.unfold_time(recon, b)

    def __call__(
        self,
        clip: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """clip: (B, T, H, W, C) -> (tokens (B, T*tpf, D), recon (B, T, H, W, C'))."""
        from jax.ad_checkpoint import checkpoint_name

        # Stage-boundary tags for remat_policy="stages"
        # (train/steps.py::make_video_train_step): under
        # save_only_these_names the backward keeps ONLY these two small
        # token tensors and recomputes within each stage — identity
        # everywhere else.
        tokens, hw = self.encode_clip(clip, train=train, deterministic=deterministic)
        tokens = checkpoint_name(tokens, "encoder_tokens")
        tokens = self.temporal_mix(tokens, mask=mask, deterministic=deterministic)
        tokens = checkpoint_name(tokens, "temporal_tokens")
        recon = self.decode_tokens(tokens, hw, train=train)
        return tokens, recon
