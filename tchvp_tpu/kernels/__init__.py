"""Pallas TPU kernels.

* :mod:`flash_attention` — blockwise-softmax attention (full + banded
  windowed), custom VJP; the production path for large token counts.
* :mod:`fused_tail` — experimental fused decoder tail (polyphase
  pixel-shuffle + three 3x3 conv stages in one kernel). Correct on
  hardware but measured 3.5x slower than XLA's conv pipeline at the
  flagship shape (see BENCHES.md); kept as a tested reference for the
  layer-fusion direction, not wired into the inference path.
"""

from tchvp_tpu.kernels import flash_attention, fused_tail

__all__ = ["flash_attention", "fused_tail"]
