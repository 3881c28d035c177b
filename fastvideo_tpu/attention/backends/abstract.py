"""Attention backend abstraction.

Analog of /root/reference/fastvideo/attention/backends/abstract.py:14-120
(vLLM-style backend -> impl + metadata). In the TPU build a backend is a
lightweight object exposing a functional ``forward`` over ``[B, S, H, D]``
arrays plus optional metadata build/pre/post hooks (used by the sparse
backends to permute tiles).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

Array = jax.Array


@dataclasses.dataclass
class AttentionMetadata:
    """Per-step metadata threaded via the forward context.

    Reference analog: ``AttentionMetadata`` built per denoising step
    (/root/reference/fastvideo/pipelines/stages/denoising.py:469-500).
    """

    current_timestep: int = 0
    extra: dict[str, Any] = dataclasses.field(default_factory=dict)


class AttentionBackend:
    """Base class; subclasses are stateless and cheap to construct."""

    name: str = "ABSTRACT"
    # Sparse backends operate on (t, h, w) tile layouts and need the video
    # grid; dense ones ignore it.
    needs_grid: bool = False
    # True when the backend can consume tokens already in tile-major order
    # (the model hoists the tile permutation to patch-embed/unpatchify).
    supports_pre_tiled: bool = False

    def __init__(self, num_heads: int, head_size: int,
                 softmax_scale: float | None = None, causal: bool = False,
                 **extra: Any):
        self.num_heads = num_heads
        self.head_size = head_size
        self.softmax_scale = (softmax_scale if softmax_scale is not None else
                              head_size**-0.5)
        self.causal = causal
        self.extra = extra

    def preprocess_qkv(self, qkv: Array,
                       metadata: AttentionMetadata | None) -> Array:
        return qkv

    def postprocess_output(self, output: Array,
                           metadata: AttentionMetadata | None) -> Array:
        return output

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None) -> Array:
        raise NotImplementedError
