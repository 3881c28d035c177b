"""NABLA adaptive block-sparse attention (Kandinsky5 "nabla" checkpoints).

Behavioral reference: /root/reference/fastvideo/attention/backends/nabla.py
(:32-61): mean-pool 64-token blocks of q/k, softmax the block map, keep the
smallest set of kv blocks whose probability mass reaches ``thr`` (per query
block), OR with a precomputed spatio-temporal-window (STA) block mask, and
run block-sparse attention under that mask.

TPU design: the reference binarizes into a torch flex-attention BlockMask;
here the mask becomes (per-row kv tile indices, per-row counts) consumed by
a Pallas gather kernel that shares the VSA double-buffered DMA structure
(ops/vsa.py) but takes a DYNAMIC per-query-tile trip count — NABLA keeps a
different number of blocks per row, so a fixed top-k loop would either
truncate mass or waste DMA on sentinel slots.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastvideo_tpu.ops.vsa import MASK_VALUE, TILE_ELEMS, _use_interpret

Array = jax.Array

NABLA_BLOCK = 64


def nabla_block_mask(q: Array, k: Array, sta_mask: Array | None,
                     thr: float = 0.9) -> Array:
    """[B, S, H, D] q/k -> bool block mask [B, H, nB, nB].

    Mirrors ``nablaT_v2`` (reference nabla.py:32-61): pooled block map,
    softmax over kv blocks, keep blocks until cumulative prob >= thr.
    """
    b, s, h, d = q.shape
    nb = s // NABLA_BLOCK
    qa = jnp.mean(q.reshape(b, nb, NABLA_BLOCK, h, d), axis=2)  # [B,nB,H,D]
    ka = jnp.mean(k.reshape(b, nb, NABLA_BLOCK, h, d), axis=2)
    qa = qa.transpose(0, 2, 1, 3).astype(jnp.float32)  # [B,H,nB,D]
    ka = ka.transpose(0, 2, 1, 3).astype(jnp.float32)
    amap = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", qa, ka) / math.sqrt(d), axis=-1)
    vals = jnp.sort(amap, axis=-1)  # ascending
    order = jnp.argsort(amap, axis=-1)
    cvals = jnp.cumsum(vals, axis=-1)
    keep_sorted = cvals >= (1.0 - thr)
    inv = jnp.argsort(order, axis=-1)
    mask = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    if sta_mask is not None:
        mask = jnp.logical_or(mask, sta_mask.astype(bool))
    return mask


def _dyn_sparse_kernel(sizes_ref, idx_ref, cnt_ref, q_ref, k_hbm, v_hbm,
                       o_ref, acc_ref, k_buf, v_buf, sems, *, scale: float,
                       tile_elems: int, q_rows: int | None = None):
    """VSA gather kernel with a per-row DYNAMIC kv-block count
    (ops/vsa.py:_sparse_kernel structure; trip count from cnt_ref)."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    row = jax.lax.rem(qi, 8)
    nb = cnt_ref[0, 0, row, 0]

    def tile_of(j):
        return idx_ref[0, 0, row, j]

    def dma_k(slot, j):
        t = jnp.maximum(tile_of(j), 0)
        return pltpu.make_async_copy(
            k_hbm.at[b, h, pl.ds(t * tile_elems, tile_elems), :],
            k_buf.at[slot], sems.at[slot, 0])

    def dma_v(slot, j):
        t = jnp.maximum(tile_of(j), 0)
        return pltpu.make_async_copy(
            v_hbm.at[b, h, pl.ds(t * tile_elems, tile_elems), :],
            v_buf.at[slot], sems.at[slot, 1])

    @pl.when(nb > 0)
    def _start():
        dma_k(0, 0).start()
        dma_v(0, 0).start()

    q = q_ref[0, 0]  # [64, D]

    def body(j, carry):
        m_prev, l_prev = carry
        slot = jax.lax.rem(j, 2)
        next_slot = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < nb)
        def _prefetch():
            dma_k(next_slot, j + 1).start()
            dma_v(next_slot, j + 1).start()

        dma_k(slot, j).wait()
        dma_v(slot, j).wait()
        k = k_buf[slot]
        v = v_buf[slot]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        t_j = tile_of(j)
        valid = jnp.where(t_j >= 0, sizes_ref[jnp.maximum(t_j, 0)], 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid, s, MASK_VALUE)

        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv
        return m_next, l_next

    rows = q_rows or tile_elems
    acc_ref[...] = jnp.zeros_like(acc_ref)
    m0 = jnp.full((rows, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    _, l = jax.lax.fori_loop(0, nb, body, (m0, l0))
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def masked_block_sparse_attention(q: Array, k: Array, v: Array,
                                  mask: Array, block_sizes: Array, *,
                                  scale: float | None = None,
                                  tile_elems: int = TILE_ELEMS) -> Array:
    """Attention under a boolean kv-block mask with per-row counts.

    q/k/v: [B, H, nB*E, D] tile-major; mask: [B, H, nQ, nK] bool;
    block_sizes: [nB] int32 valid token counts per tile.
    """
    b, h, s, d = q.shape
    nq = s // tile_elems
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    counts = jnp.sum(mask, axis=-1).astype(jnp.int32)  # [B,H,nQ]
    # valid block ids first (stable sort of ~mask keeps ascending id order
    # within the kept set), sentinel -1 beyond the count
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
                               tile_elems=tile_elems)
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
            pl.BlockSpec((1, 1, tile_elems, d),
                         lambda b, h, qi, sz: (b, h, qi, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_elems, d),
                               lambda b, h, qi, sz: (b, h, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile_elems, d), jnp.float32),
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


def nabla_attention(q: Array, k: Array, v: Array, *,
                    sta_mask: Array | None = None, thr: float = 0.9,
                    scale: float | None = None) -> Array:
    """Full NABLA forward on [B, S, H, D] tensors; S % 64 == 0 (the model
    provides fractal/tile ordering upstream, reference nabla.py:139-147)."""
    b, s, h, d = q.shape
    assert s % NABLA_BLOCK == 0, "NABLA needs S divisible by 64"
    mask = nabla_block_mask(q, k, sta_mask, thr)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    sizes = jnp.full((s // NABLA_BLOCK,), NABLA_BLOCK, jnp.int32)
    out = masked_block_sparse_attention(qt, kt, vt, mask, sizes,
                                        scale=scale,
                                        tile_elems=NABLA_BLOCK)
    return out.transpose(0, 2, 1, 3)
