"""SageAttention TPU analog: int8-quantized QK^T.

Behavioral reference: /root/reference/fastvideo/attention/backends/
sage_attn.py (SageAttention: smooth K by subtracting its per-head mean,
per-token int8 quantization of Q and K, int8 QK^T, fp32 softmax, fp16 PV).
On TPU the int8 matmul hits the MXU's int8 path via
``lax.dot_general(..., preferred_element_type=int32)``; the K-mean shift
is exactly compensated by softmax's shift invariance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)

Array = jax.Array


def _quantize_per_token(x: Array) -> tuple[Array, Array]:
    """[B, S, H, D] -> int8 values + per-(B,S,H) fp32 scales."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


class SageAttentionBackend(AttentionBackend):
    name = "SAGE_ATTN"

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None) -> Array:
        del metadata
        # smooth K: subtract the per-head mean over tokens (softmax is
        # invariant to a constant shift along the kv axis)
        k_mean = jnp.mean(k.astype(jnp.float32), axis=1, keepdims=True)
        k_smooth = k.astype(jnp.float32) - k_mean

        q_i8, q_scale = _quantize_per_token(q)
        k_i8, k_scale = _quantize_per_token(k_smooth)

        # int8 QK^T on the MXU: [B,S,H,D] x [B,T,H,D] -> [B,H,S,T] int32
        s_i32 = jax.lax.dot_general(
            q_i8, k_i8,
            dimension_numbers=(((3,), (3,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.int32)
        scores = s_i32.astype(jnp.float32)
        scores = scores * q_scale.transpose(0, 2, 1, 3)  # [B,H,S,1]
        scores = scores * k_scale.transpose(0, 2, 3, 1)  # [B,H,1,T]
        scores = scores * self.softmax_scale

        if kv_valid is not None and kv_valid < k.shape[1]:
            kv_idx = jnp.arange(k.shape[1])
            scores = jnp.where(kv_idx[None, None, None, :] < kv_valid,
                               scores, -jnp.inf)
        if self.causal:
            s_len, t_len = scores.shape[-2:]
            row = jnp.arange(s_len)[:, None]
            col = jnp.arange(t_len)[None, :]
            scores = jnp.where(col <= row, scores, -jnp.inf)

        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhst,bthd->bshd", p.astype(v.dtype), v)
        return out.astype(q.dtype)
