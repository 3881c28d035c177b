"""Pallas TPU kernels (replacing /root/reference/fastvideo-kernel CUDA/Triton)."""

from fastvideo_tpu.ops.flash_attention import flash_attention

__all__ = ["flash_attention"]
