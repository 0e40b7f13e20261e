"""tchvp_tpu — TPU-native Transformer-CNN hybrid video-processing framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference PyTorch research codebase
``spygaurad/Transformer-CNN-Hybrid-Network-for-Video-Processing``:

* Image->Image autoencoding (denoising / inpainting), cf. reference
  ``Model.py`` / ``AutoEncoder.py``.
* Image->Segmentation-mask prediction, cf. reference ``FCT.py`` /
  ``UNet.py`` / ``AE_Unet_Combined.py``.
* Video latent pipeline: per-frame CNN encoder -> temporal transformer ->
  CNN decoder, cf. recovered reference ``AE_32K.py`` / ``AE_256_32K.py`` /
  ``TransformerEncoder.py``.

Design stance (TPU-first, not a port):
* NHWC layouts everywhere internally (MXU-friendly); NCHW adapters at the
  public API boundary mirror the reference tensor conventions.
* bf16 compute / fp32 params via a ``dtype`` policy on every module.
* Pure-functional flax.linen modules; single jitted train step per workload.
* Pallas flash-attention kernels for the spatial and temporal attention
  hot spots; einsum/XLA fallback behind one op interface.
* ``jax.sharding.Mesh`` + NamedSharding data/sequence parallelism instead of
  single-device eager execution.
"""

__version__ = "0.1.0"

from tchvp_tpu import config, layout, losses, models, ops, data, parallel, train

__all__ = [
    "config",
    "layout",
    "losses",
    "models",
    "ops",
    "data",
    "parallel",
    "train",
    "__version__",
]
