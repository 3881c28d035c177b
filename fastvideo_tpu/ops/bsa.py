"""BSA — Bidirectional Sparse Attention (arXiv:2509.01085).

Behavioral reference: /root/reference/fastvideo/attention/backends/
bsa_attn.py (:88-740): sparsify BOTH sides — prune redundant query tokens
per 64-token tile (drop the ones most cosine-similar to the tile center)
and select kv tiles per query tile by cumulative block-softmax mass
(variable count, floored at ``min_kv_blocks``) — then attend pruned
queries against the selected tiles and fill pruned positions with the
nearest kept token's output.

TPU mapping: the kv side reuses the dynamic-count Pallas gather kernel
(ops/nabla.py, VSA DMA structure); the pruned-query tiles become the
kernel's query blocks (q rows per tile = keep_size, not 64). Pruning,
selection, and nearest-fill are plain XLA gathers.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastvideo_tpu.ops.nabla import _dyn_sparse_kernel
from fastvideo_tpu.ops.vsa import TILE_ELEMS, _use_interpret

Array = jax.Array


def prune_queries(q_blocks: Array,
                  keep_ratio: float) -> tuple[Array, Array, int]:
    """[B, H, N, S, D] -> keep the keep_ratio*S tokens LEAST similar to
    the tile center (reference _prune_queries)."""
    b, h, n, s, d = q_blocks.shape
    keep = max(1, int(s * keep_ratio))
    if keep >= s:
        idx = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32),
                               (b, h, n, s))
        return q_blocks, idx, s
    center = q_blocks[:, :, :, s // 2:s // 2 + 1]
    qn = q_blocks / jnp.linalg.norm(q_blocks, axis=-1, keepdims=True)
    cn = center / jnp.linalg.norm(center, axis=-1, keepdims=True)
    sim = jnp.sum(qn * cn, axis=-1)  # [B, H, N, S]
    _, idx = jax.lax.top_k(-sim, keep)  # least similar
    idx = jnp.sort(idx, axis=-1).astype(jnp.int32)
    sparse_q = jnp.take_along_axis(q_blocks, idx[..., None], axis=3)
    return sparse_q, idx, keep


def select_kv_blocks(sparse_q: Array, k_blocks: Array,
                     cumulative_threshold: float,
                     min_kv_blocks: int) -> Array:
    """Boolean kv mask per query tile (reference _select_kv_blocks)."""
    d = sparse_q.shape[-1]
    n = k_blocks.shape[2]
    q_repr = jnp.mean(sparse_q.astype(jnp.float32), axis=3)
    k_repr = jnp.mean(k_blocks.astype(jnp.float32), axis=3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q_repr, k_repr) / math.sqrt(d)
    block_attn = jax.nn.softmax(scores, axis=-1)
    order = jnp.argsort(-block_attn, axis=-1)
    sorted_attn = jnp.take_along_axis(block_attn, order, axis=-1)
    cumsum = jnp.cumsum(sorted_attn, axis=-1)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cumsum[..., :1], bool),
         cumsum[..., :-1] < cumulative_threshold], axis=-1)
    pos = jnp.arange(n)
    keep_sorted = keep_sorted | (pos < min(min_kv_blocks, n))
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(keep_sorted, inv, axis=-1)


def reconstruct_pruned(sparse_out: Array, keep_idx: Array,
                       block_size: int) -> Array:
    """[B, H, N, keep, D] -> [B, H, N, block_size, D]: every position
    takes the output of its NEAREST kept token (kept positions are their
    own nearest; reference _reconstruct_pruned)."""
    keep = sparse_out.shape[3]
    if keep >= block_size:
        return sparse_out
    pos = jnp.arange(block_size)
    # [B, H, N, block_size, keep] distances
    dists = jnp.abs(pos[None, None, None, :, None] -
                    keep_idx[:, :, :, None, :])
    nearest = jnp.argmin(dists, axis=-1)  # [B, H, N, block_size]
    return jnp.take_along_axis(sparse_out, nearest[..., None], axis=3)


def _masked_sparse_qtile(q: Array, k: Array, v: Array, mask: Array,
                         block_sizes: Array, q_rows: int, *,
                         scale: float,
                         tile_elems: int = TILE_ELEMS) -> Array:
    """Dynamic-count gather attention with a q tile of ``q_rows`` rows
    (the BSA pruned-query case; q: [B, H, nQ*q_rows, D])."""
    b, h, sq, d = q.shape
    nq = sq // q_rows
    counts = jnp.sum(mask, axis=-1).astype(jnp.int32)
    order = jnp.argsort(~mask, axis=-1, stable=True).astype(jnp.int32)
    col = jnp.arange(mask.shape[-1], dtype=jnp.int32)
    inds = jnp.where(col[None, None, None] < counts[..., None], order, -1)

    nq_pad = math.ceil(nq / 8) * 8
    nk_pad = math.ceil(mask.shape[-1] / 128) * 128
    idx = jnp.full((b, h, nq_pad, nk_pad), -1, jnp.int32)
    idx = idx.at[:, :, :nq, :mask.shape[-1]].set(inds)
    cnt = jnp.zeros((b, h, nq_pad, 128), jnp.int32)
    cnt = cnt.at[:, :, :nq, 0].set(counts)

    kernel = functools.partial(_dyn_sparse_kernel, scale=scale,
                               tile_elems=tile_elems, q_rows=q_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, 8, nk_pad),
                         lambda b, h, qi, sz: (b, h, qi // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8, 128),
                         lambda b, h, qi, sz: (b, h, qi // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, q_rows, d),
                         lambda b, h, qi, sz: (b, h, qi, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, q_rows, d),
                               lambda b, h, qi, sz: (b, h, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((q_rows, d), jnp.float32),
            pltpu.VMEM((2, tile_elems, d), k.dtype),
            pltpu.VMEM((2, tile_elems, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_use_interpret(),
    )(block_sizes.astype(jnp.int32), idx, cnt, q, k, v)


def bsa_attention(q: Array, k: Array, v: Array, *,
                  query_keep_ratio: float = 0.5,
                  kv_cumulative_threshold: float = 0.9,
                  min_kv_blocks: int = 1,
                  scale: float | None = None) -> Array:
    """Full BSA forward on TILE-ORDERED [B, S, H, D]; S % 64 == 0
    (reference BSAAttentionImpl.forward)."""
    b, s, h, d = q.shape
    assert s % TILE_ELEMS == 0, "BSA needs S divisible by 64"
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    n = s // TILE_ELEMS
    qb = q.transpose(0, 2, 1, 3).reshape(b, h, n, TILE_ELEMS, d)
    kb = k.transpose(0, 2, 1, 3).reshape(b, h, n, TILE_ELEMS, d)
    vb = v.transpose(0, 2, 1, 3)

    sparse_q, keep_idx, keep = prune_queries(qb, query_keep_ratio)
    kv_mask = select_kv_blocks(sparse_q, kb, kv_cumulative_threshold,
                               min_kv_blocks)

    # Mosaic block rows want multiples of 8
    keep_pad = max(8, math.ceil(keep / 8) * 8)
    if keep_pad != keep:
        sparse_q = jnp.pad(sparse_q,
                           ((0, 0), (0, 0), (0, 0), (0, keep_pad - keep),
                            (0, 0)))
    qs = sparse_q.reshape(b, h, n * keep_pad, d)
    sizes = jnp.full((n,), TILE_ELEMS, jnp.int32)
    out = _masked_sparse_qtile(qs, kb.reshape(b, h, s, d), vb, kv_mask,
                               sizes, keep_pad, scale=scale)
    out = out.reshape(b, h, n, keep_pad, d)[:, :, :, :keep]
    full = reconstruct_pruned(out, keep_idx, TILE_ELEMS)
    return full.reshape(b, h, s, d).transpose(0, 2, 1, 3)
