"""Inference engines (serving-side optimizations over the flax models)."""

from tchvp_tpu.infer.server import ArtifactServer, post_npy, serve_artifact
from tchvp_tpu.infer.export import (
    ServingModel,
    export_int8_video_model,
    export_serving,
    export_video_model,
    load_artifact,
    save_artifact,
)
from tchvp_tpu.infer.quant import (
    Int8Engine,
    calibrate_conv_scales,
    quantize_conv_params,
)

__all__ = [
    "ArtifactServer",
    "post_npy",
    "serve_artifact",
    "Int8Engine",
    "ServingModel",
    "calibrate_conv_scales",
    "export_int8_video_model",
    "export_serving",
    "export_video_model",
    "load_artifact",
    "quantize_conv_params",
    "save_artifact",
]
