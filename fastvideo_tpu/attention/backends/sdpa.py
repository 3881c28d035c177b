"""Portable XLA dot-product attention backend.

Analog of /root/reference/fastvideo/attention/backends/sdpa.py:13-80 — the
hardware-free fallback used by CPU tests. ``jax.nn.dot_product_attention``
lowers to fused XLA ops everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)

Array = jax.Array


class SDPABackend(AttentionBackend):
    name = "TORCH_SDPA"  # keep the reference's selector token for drop-in

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None) -> Array:
        mask = None
        if kv_valid is not None and kv_valid < k.shape[1]:
            kv_idx = jnp.arange(k.shape[1])
            mask = (kv_idx < kv_valid)[None, None, None, :]
        return jax.nn.dot_product_attention(
            q, k, v,
            scale=self.softmax_scale,
            is_causal=self.causal,
            mask=mask,
        )
