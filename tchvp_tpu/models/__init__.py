"""Model families (survey layer L4), all NHWC flax.linen modules."""

from tchvp_tpu.models.autoencoder import AutoEncoder, Decoder, Encoder
from tchvp_tpu.models.combined import Image2Image2Mask
from tchvp_tpu.models.fct import FCT, BlockDecoder, BlockEncoderBottleneck, DSOut
from tchvp_tpu.models.resnet_ae import (
    Autoencoder4K,
    Autoencoder32K,
    Decoder32K,
    Encoder32K,
    latent_to_tokens,
    tokens_to_latent,
)
from tchvp_tpu.models.transformer import TokenMultiheadAttention, TransformerEncoder
from tchvp_tpu.models.streaming import (
    StreamingConfig,
    make_streamer,
    microbatched_infer,
    stream_clip,
    stream_video,
)
from tchvp_tpu.models.unet import UNet
from tchvp_tpu.models.video import VideoHybridNet, sinusoidal_posenc

__all__ = [
    "AutoEncoder",
    "Encoder",
    "Decoder",
    "Image2Image2Mask",
    "FCT",
    "BlockDecoder",
    "BlockEncoderBottleneck",
    "DSOut",
    "Autoencoder32K",
    "Autoencoder4K",
    "Encoder32K",
    "Decoder32K",
    "latent_to_tokens",
    "tokens_to_latent",
    "TokenMultiheadAttention",
    "TransformerEncoder",
    "UNet",
    "VideoHybridNet",
    "sinusoidal_posenc",
    "StreamingConfig",
    "make_streamer",
    "microbatched_infer",
    "stream_clip",
    "stream_video",
]
