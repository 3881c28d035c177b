"""NABLA_ATTN backend (Kandinsky5 adaptive block sparsity).

Analog of /root/reference/fastvideo/attention/backends/nabla.py:64-147.
Metadata keys (in ``AttentionMetadata.extra``):
- ``nabla_sta_mask``: optional [B?, H?, nB, nB] block-level STA window
  mask OR'd into the adaptive map (reference NablaAttentionMetadata).
- ``nabla_P``: cumulative-probability threshold (default 0.9).

The mask spans the full sequence, so this backend is LocalAttention-only
(no sequence parallelism), matching the reference's restriction.
"""

from __future__ import annotations

import jax

from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)
from fastvideo_tpu.ops.nabla import nabla_attention

Array = jax.Array


class NablaAttentionBackend(AttentionBackend):
    name = "NABLA_ATTN"

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None, **_: object) -> Array:
        sta_mask = None
        thr = 0.9
        if metadata is not None:
            sta_mask = metadata.extra.get("nabla_sta_mask")
            thr = float(metadata.extra.get("nabla_P", thr))
        return nabla_attention(q, k, v, sta_mask=sta_mask, thr=thr,
                               scale=self.softmax_scale)
