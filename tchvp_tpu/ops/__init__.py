"""Reusable blocks/ops (survey layer L3) as pure flax.linen modules."""

from tchvp_tpu.ops.basic import (
    avg_pool_2x2,
    max_pool_2x2,
    upsample2x_nearest,
)
from tchvp_tpu.ops.attention import (
    TorchMultiheadAttention,
    multi_head_attention,
    sdpa_xla,
)
from tchvp_tpu.ops.conv_attention import (
    ConvProjAttention,
    SpatialTransformer,
    WideFocus,
)
from tchvp_tpu.ops.blocks import (
    Bottleneck,
    ConvBNReLUBlock,
    DecoderBlock,
    DeepSupervisionBlock,
    EncoderBlock,
)
from tchvp_tpu.ops.moe import MoEFFN, total_load_balance_loss
from tchvp_tpu.ops.msssim import ms_ssim, ssim
from tchvp_tpu.ops.tiling import pad_frames, tile_frames, untile_frames

__all__ = [
    "avg_pool_2x2",
    "max_pool_2x2",
    "upsample2x_nearest",
    "TorchMultiheadAttention",
    "multi_head_attention",
    "sdpa_xla",
    "ConvProjAttention",
    "SpatialTransformer",
    "WideFocus",
    "Bottleneck",
    "ConvBNReLUBlock",
    "DecoderBlock",
    "DeepSupervisionBlock",
    "EncoderBlock",
    "MoEFFN",
    "total_load_balance_loss",
    "ms_ssim",
    "ssim",
    "pad_frames",
    "tile_frames",
    "untile_frames",
]
