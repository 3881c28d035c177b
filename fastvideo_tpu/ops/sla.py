"""SLA — Sparse-Linear Attention (TurboDiffusion / arXiv:2509.24006).

Behavioral reference: /root/reference/fastvideo/attention/backends/sla.py
(:43-346): top-k block-sparse attention (block map from mean-pooled Q and
smooth-K pooled K) plus a linear-attention branch over feature-mapped
q/k, combined through a zero-init learnable per-head-dim projection.

TPU mapping: the sparse branch rides the VSA Pallas gather kernel
(ops/vsa.py) with the top-k lut as its index array; pooling/topk/linear
branch are plain XLA ops (fused elementwise + two small matmuls). The
reference uses BLKQ=128 / BLKK=64; on TPU both are the kernel's 64-token
tile (the top-k budget is per 64-token query block, a strictly finer
selection granularity).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from fastvideo_tpu.ops.vsa import TILE_ELEMS, block_sparse_attention

Array = jax.Array


def _mean_pool_blocks(x: Array, blk: int) -> Array:
    """[B, H, L, D] -> [B, H, L/blk, D] (reference mean_pool)."""
    b, h, s, d = x.shape
    return jnp.mean(x.reshape(b, h, s // blk, blk, d), axis=3)


def sla_block_map(q: Array, k: Array, topk_ratio: float,
                  blk: int = TILE_ELEMS) -> tuple[Array, int]:
    """Top-k kv-block lut per query block (reference get_block_map).

    q/k: [B, H, L, D]. Returns (lut [B, H, nQ, topk], topk).
    """
    k_smooth = k - jnp.mean(k, axis=-2, keepdims=True)  # smooth-k (Sage)
    pq = _mean_pool_blocks(q.astype(jnp.float32), blk)
    pk = _mean_pool_blocks(k_smooth.astype(jnp.float32), blk)
    score = jnp.einsum("bhqd,bhkd->bhqk", pq, pk)
    nk = score.shape[-1]
    topk = max(1, min(nk, int(topk_ratio * nk)))
    _, lut = jax.lax.top_k(score, topk)
    return lut.astype(jnp.int32), topk


def linear_attention(q: Array, k: Array, v: Array,
                     feature_map: str = "softmax") -> Array:
    """(phi(Q) @ phi(K)^T V) / normalizer (reference
    _calc_linear_attention); q/k/v [B, H, L, D]."""
    if feature_map == "softmax":
        fq = jax.nn.softmax(q.astype(jnp.float32), axis=-1)
        fk = jax.nn.softmax(k.astype(jnp.float32), axis=-1)
    elif feature_map == "elu":
        fq = jax.nn.elu(q.astype(jnp.float32)) + 1
        fk = jax.nn.elu(k.astype(jnp.float32)) + 1
    elif feature_map == "relu":
        fq = jax.nn.relu(q.astype(jnp.float32))
        fk = jax.nn.relu(k.astype(jnp.float32))
    else:
        raise ValueError(f"Unknown feature map: {feature_map}")
    vf = v.astype(jnp.float32)
    kvsum = jnp.einsum("bhld,bhle->bhde", fk, vf)
    ksum = jnp.sum(fk, axis=-2, keepdims=True)
    num = jnp.einsum("bhld,bhde->bhle", fq, kvsum)
    den = 1e-5 + jnp.sum(fq * ksum, axis=-1, keepdims=True)
    return (num / den).astype(v.dtype)


def sla_attention(q: Array, k: Array, v: Array, *,
                  topk_ratio: float = 0.1,
                  feature_map: str = "softmax",
                  proj_weight: Array | None = None,
                  proj_bias: Array | None = None,
                  scale: float | None = None) -> Array:
    """Full SLA forward on [B, S, H, D]; S % 64 == 0.

    ``proj_weight``/``proj_bias`` are the fine-tuned combiner params
    ([D, D] / [D]); zeros (the reference's init) when omitted, which
    reduces the combination to the sparse branch alone.
    """
    b, s, hh, d = q.shape
    assert s % TILE_ELEMS == 0, "SLA needs S divisible by 64"
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    lut, _ = sla_block_map(qt, kt, topk_ratio)
    sizes = jnp.full((s // TILE_ELEMS,), TILE_ELEMS, jnp.int32)
    o_s = block_sparse_attention(qt, kt, vt, lut, sizes, scale=scale)

    o_l = linear_attention(qt, kt, vt, feature_map)
    if proj_weight is not None:
        o_l = jnp.einsum("bhld,de->bhle", o_l.astype(jnp.float32),
                         proj_weight.astype(jnp.float32))
        if proj_bias is not None:
            o_l = o_l + proj_bias.astype(jnp.float32)
        o_l = o_l.astype(v.dtype)
    else:
        o_l = jnp.zeros_like(o_s)

    return (o_s + o_l.astype(o_s.dtype)).transpose(0, 2, 1, 3)
