"""Pallas flash-attention backend (TPU analog of FLASH_ATTN).

Reference: /root/reference/fastvideo/attention/backends/flash_attn.py (FA2/3
CUDA). Here the kernel is fastvideo_tpu.ops.flash_attention.
"""

from __future__ import annotations

import jax

from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)
from fastvideo_tpu.ops.flash_attention import flash_attention

Array = jax.Array


class FlashAttentionBackend(AttentionBackend):
    name = "FLASH_ATTN"

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None) -> Array:
        return flash_attention(
            q, k, v,
            scale=self.softmax_scale,
            causal=self.causal,
            kv_valid=kv_valid,
        )
