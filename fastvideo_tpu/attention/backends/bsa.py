"""BSA_ATTN backend (bidirectional sparse attention).

Analog of /root/reference/fastvideo/attention/backends/bsa_attn.py:545-740.
Training-free: applies query pruning + kv-block selection at inference on
any full-attention checkpoint. Metadata keys (``extra``):
``bsa_query_keep_ratio`` (default 0.5), ``bsa_cumulative_threshold``
(default 0.9), ``bsa_min_kv_blocks`` (default 1).

Like the reference, q/k/v must arrive tile-contiguous; the video models
hand the (t, h, w) grid to ``forward`` and the backend reorders via the
VSA tile layout (reference preprocess_qkv/postprocess_output).
"""

from __future__ import annotations

import jax

from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)
from fastvideo_tpu.ops.bsa import bsa_attention
from fastvideo_tpu.ops.vsa import tile_tokens, untile_tokens

Array = jax.Array


class BSAAttentionBackend(AttentionBackend):
    name = "BSA_ATTN"
    needs_grid = True

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None,
                grid: tuple[int, int, int] | None = None,
                gate: Array | None = None) -> Array:
        extra = metadata.extra if metadata is not None else {}
        kwargs = dict(
            query_keep_ratio=float(extra.get("bsa_query_keep_ratio", 0.5)),
            kv_cumulative_threshold=float(
                extra.get("bsa_cumulative_threshold", 0.9)),
            min_kv_blocks=int(extra.get("bsa_min_kv_blocks", 1)),
            scale=self.softmax_scale)
        if grid is None:
            # already tile-ordered (or 1D) sequence
            return bsa_attention(q, k, v, **kwargs)
        dit_shape = tuple(int(g) for g in grid)
        s_tokens = dit_shape[0] * dit_shape[1] * dit_shape[2]
        s_in = q.shape[1]
        qt = tile_tokens(q[:, :s_tokens], dit_shape)
        kt = tile_tokens(k[:, :s_tokens], dit_shape)
        vt = tile_tokens(v[:, :s_tokens], dit_shape)
        out = bsa_attention(qt, kt, vt, **kwargs)
        out = untile_tokens(out, dit_shape)
        if s_in > s_tokens:
            import jax.numpy as jnp

            out = jnp.pad(out, ((0, 0), (0, s_in - s_tokens), (0, 0),
                                (0, 0)))
        return out
