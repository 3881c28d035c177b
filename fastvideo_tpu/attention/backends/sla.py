"""SLA_ATTN backend (TurboDiffusion sparse-linear attention).

Analog of /root/reference/fastvideo/attention/backends/sla.py:118-346.
Metadata keys (``AttentionMetadata.extra``):
- ``sla_topk_ratio``: kv-block keep ratio (default 0.1, TurboDiffusion)
- ``sla_feature_map``: softmax | elu | relu
- ``sla_proj_weight`` / ``sla_proj_bias``: fine-tuned combiner params
  (zero-init behavior when absent, matching the reference init).
"""

from __future__ import annotations

import jax

from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)
from fastvideo_tpu.ops.sla import sla_attention

Array = jax.Array


class SLAAttentionBackend(AttentionBackend):
    name = "SLA_ATTN"

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None, **_: object) -> Array:
        extra = metadata.extra if metadata is not None else {}
        return sla_attention(
            q, k, v,
            topk_ratio=float(extra.get("sla_topk_ratio", 0.1)),
            feature_map=str(extra.get("sla_feature_map", "softmax")),
            proj_weight=extra.get("sla_proj_weight"),
            proj_bias=extra.get("sla_proj_bias"),
            scale=self.softmax_scale)
