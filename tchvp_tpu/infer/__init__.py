"""Inference engines (serving-side optimizations over the flax models)."""

from tchvp_tpu.infer.quant import (
    Int8Engine,
    calibrate_conv_scales,
    quantize_conv_params,
)

__all__ = ["Int8Engine", "calibrate_conv_scales", "quantize_conv_params"]
