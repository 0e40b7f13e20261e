"""Pallas TPU kernels: flash attention (fwd+bwd)."""

from tchvp_tpu.kernels import flash_attention

__all__ = ["flash_attention"]
