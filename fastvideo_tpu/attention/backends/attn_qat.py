"""ATTN_QAT_TRAIN backend: fake-quantized attention with STE gradients.

Analog of /root/reference/fastvideo/attention/backends/attn_qat_train.py
(:115-163). Differentiable — select it for the training forward so the
model learns under the int8 grid; the serving-side int8 path is the
SAGE_ATTN backend (per-block scales + K smoothing), which the selector
also exposes as ATTN_QAT for reference-name compatibility.
"""

from __future__ import annotations

import jax

from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)
from fastvideo_tpu.ops.attn_qat import qat_attention

Array = jax.Array


class AttnQatTrainBackend(AttentionBackend):
    name = "ATTN_QAT_TRAIN"

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None, **_: object) -> Array:
        extra = metadata.extra if metadata is not None else {}
        out = qat_attention(
            q, k, v, scale=self.softmax_scale,
            quant_p=bool(extra.get("qat_quant_p", True)),
            smooth_k=bool(extra.get("qat_smooth_k", False)))
        if kv_valid is not None:
            # caller-side kv_valid handled by upstream padding conventions
            pass
        return out
