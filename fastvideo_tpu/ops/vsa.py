"""Video Sparse Attention (VSA) for TPU.

Re-implements the reference's VSA composition
(/root/reference/fastvideo-kernel/python/fastvideo_kernel/ops.py:69-145 +
csrc/attention/block_sparse_h100.cu) the TPU way:

* tokens are permuted into (4,4,4)=64-token video tiles (static gather
  indices per shape, computed host-side);
* compression branch: per-tile mean pooled q/k/v -> dense coarse attention
  over tiles (tiny [nB, nB] problem, plain XLA);
* top-k tile selection from the coarse scores (jax.lax.top_k);
* sparse branch: a Pallas kernel where each 64-token query tile attends only
  its selected kv tiles. KV tiles are fetched via scalar-prefetched gather
  indices in the BlockSpec index map — the TPU analog of the CUDA kernel's
  TMA gather. Online softmax over the selected tiles; per-tile valid-token
  masking handles the padded partial tiles (variable_block_sizes).

out = out_compress * gate + out_sparse (ops.py:141-144).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _use_interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU (tests).
    return jax.default_backend() == "cpu"

VSA_TILE_SIZE = (4, 4, 4)
TILE_ELEMS = 64
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


# -- static tile index tables (host numpy, cached per shape) ----------------


@functools.lru_cache(maxsize=32)
def tile_layout(dit_seq_shape: tuple[int, int, int],
                tile_size: tuple[int, int, int] = VSA_TILE_SIZE):
    """Returns (scatter_index, gather_back_index, block_sizes, num_tiles).

    ``scatter_index[i]`` = position in the padded tiled buffer of source
    token i (composing the reference's tile_partition_indices +
    non_pad_index, video_sparse_attn.py:33-113). ``gather_back_index``
    inverts it. ``block_sizes[j]`` = valid tokens in tile j.
    """
    T, H, W = dit_seq_shape
    ts, hs, ws = tile_size
    nt, nh, nw = (math.ceil(T / ts), math.ceil(H / hs), math.ceil(W / ws))
    elems = ts * hs * ws

    token_ids = np.arange(T * H * W).reshape(T, H, W)
    scatter = np.zeros(T * H * W, dtype=np.int64)
    block_sizes = np.zeros(nt * nh * nw, dtype=np.int32)
    tile_idx = 0
    for t in range(nt):
        for h in range(nh):
            for w in range(nw):
                blk = token_ids[t * ts:(t + 1) * ts, h * hs:(h + 1) * hs,
                                w * ws:(w + 1) * ws].reshape(-1)
                base = tile_idx * elems
                scatter[blk] = base + np.arange(blk.size)
                block_sizes[tile_idx] = blk.size
                tile_idx += 1
    padded_len = nt * nh * nw * elems
    gather_back = scatter  # out[..., i] = tiled[..., scatter[i]]
    return (scatter, gather_back, block_sizes, (nt, nh, nw), padded_len)


def tile_tokens(x: Array, dit_seq_shape: tuple[int, int, int],
                tile_size: tuple[int, int, int] = VSA_TILE_SIZE) -> Array:
    """[B, S, ...] token order -> [B, S_pad, ...] tile-major padded order."""
    scatter, _, _, _, padded_len = tile_layout(tuple(dit_seq_shape),
                                               tuple(tile_size))
    out_shape = (x.shape[0], padded_len, *x.shape[2:])
    out = jnp.zeros(out_shape, x.dtype)
    return out.at[:, jnp.asarray(scatter)].set(x)


def untile_tokens(x: Array, dit_seq_shape: tuple[int, int, int],
                  tile_size: tuple[int, int, int] = VSA_TILE_SIZE) -> Array:
    """[B, S_pad, ...] tiled order -> [B, S, ...] original token order."""
    _, gather_back, _, _, _ = tile_layout(tuple(dit_seq_shape),
                                          tuple(tile_size))
    return x[:, jnp.asarray(gather_back)]


def block_mean(x: Array, block_sizes: Array,
               tile_elems: int = TILE_ELEMS) -> Array:
    """[B, H, nB*E, D] -> [B, H, nB, D] mean over valid tokens per tile."""
    b, h, s, d = x.shape
    nb = s // tile_elems
    xs = x.reshape(b, h, nb, tile_elems, d)
    sums = jnp.sum(xs.astype(jnp.float32), axis=3)
    return (sums / block_sizes[None, None, :, None]).astype(x.dtype)


# -- Pallas block-sparse kernel --------------------------------------------


def _sparse_kernel(sizes_ref, idx_ref, q_ref, k_hbm, v_hbm, o_ref, acc_ref,
                   k_buf, v_buf, sems, *, scale: float, topk: int,
                   tile_elems: int):
    """Paged-attention-style gather: per query tile, DMA its top-k KV tiles
    from HBM with double buffering (guide: paged attention / double
    buffering patterns). Indices arrive as an (8, topk_pad128)-aligned SMEM
    block covering 8 query tiles — a full scalar-prefetch array overflows
    SMEM at production tile counts, and unaligned per-row DMA violates
    Mosaic's (8, 128) slice tiling."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    row = jax.lax.rem(qi, 8)

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

    dma_k(0, 0).start()
    dma_v(0, 0).start()

    q = q_ref[0, 0]  # [64, D]

    def body(j, carry):
        m_prev, l_prev = carry
        slot = jax.lax.rem(j, 2)
        next_slot = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < topk)
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
        # sentinel index -1 marks a padded slot (STA ragged windows)
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

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m0 = jnp.full((tile_elems, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((tile_elems, 1), jnp.float32)
    _, l = jax.lax.fori_loop(0, topk, body, (m0, l0))
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def block_sparse_attention(q: Array, k: Array, v: Array, indices: Array,
                           block_sizes: Array, *,
                           scale: float | None = None,
                           tile_elems: int = TILE_ELEMS) -> Array:
    """Block-sparse attention over tiled tokens.

    q/k/v: [B, H, nB*E, D] in tile-major padded order.
    indices: [B, H, nQ, K] int32 — selected kv tile ids per query tile.
    block_sizes: [nB] int32 valid token counts.
    """
    b, h, s, d = q.shape
    nq = s // tile_elems
    topk = indices.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    # align the index array to Mosaic's (8, 128) SMEM block tiling; padded
    # entries are never read (the kv loop bound stays at the true topk).
    nq_pad = math.ceil(nq / 8) * 8
    topk_pad = math.ceil(topk / 128) * 128
    idx = jnp.zeros((b, h, nq_pad, topk_pad), jnp.int32)
    idx = idx.at[:, :, :nq, :topk].set(indices.astype(jnp.int32))

    kernel = functools.partial(_sparse_kernel, scale=scale, topk=topk,
                               tile_elems=tile_elems)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_sizes only (tiny)
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, 8, topk_pad),
                         lambda b, h, qi, sz: (b, h, qi // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tile_elems, d),
                         lambda b, h, qi, sz: (b, h, qi, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # k stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # v stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, tile_elems, d),
                               lambda b, h, qi, sz: (b, h, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile_elems, d), jnp.float32),  # acc
            pltpu.VMEM((2, tile_elems, d), k.dtype),  # k double buffer
            pltpu.VMEM((2, tile_elems, d), v.dtype),  # v double buffer
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        interpret=_use_interpret(),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * topk * tile_elems * d,
            bytes_accessed=2 * b * h * s * d * 4,
            transcendentals=b * h * s * topk * tile_elems,
        ),
    )(block_sizes.astype(jnp.int32), idx, q, k, v)


def _sparse_attention_reference(q, k, v, indices, block_sizes, scale,
                                tile_elems: int = TILE_ELEMS):
    """Dense-math reference for the sparse branch (tests + VJP fallback)."""
    b, h, s, d = q.shape
    nb = s // tile_elems
    col_tile = jnp.arange(s) // tile_elems
    # allowed[b,h,qtile,kvtile]; sentinel (-1) routes to a dummy extra column that is dropped
    allowed = jnp.zeros((b, h, nb, nb + 1), bool)
    allowed = allowed.at[
        jnp.arange(b)[:, None, None, None],
        jnp.arange(h)[None, :, None, None],
        jnp.arange(nb)[None, None, :, None],
        jnp.where(indices >= 0, indices, nb)].set(True)
    allowed = allowed[..., :nb]
    tok_allowed = allowed[:, :, :, col_tile]  # [b,h,nq,s_kv] per tile
    tok_allowed = jnp.repeat(tok_allowed, tile_elems, axis=2)
    col_in_tile = jnp.arange(s) % tile_elems
    valid = col_in_tile < block_sizes[col_tile]
    mask = tok_allowed & valid[None, None, None, :]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    scores = jnp.where(mask, scores, MASK_VALUE)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


# -- full VSA composition ---------------------------------------------------


def video_sparse_attn(
    q: Array,
    k: Array,
    v: Array,
    block_sizes: Array,
    topk: int,
    *,
    gate_compress: Array | None = None,
    scale: float | None = None,
    use_pallas: bool = True,
    tile_elems: int = TILE_ELEMS,
) -> Array:
    """VSA over tiled [B, H, S_pad, D] tensors (reference ops.py:69-145)."""
    b, h, s, d = q.shape
    nb = s // tile_elems
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    topk = max(1, min(topk, nb))

    q_c = block_mean(q, block_sizes, tile_elems)
    k_c = block_mean(k, block_sizes, tile_elems)
    v_c = block_mean(v, block_sizes, tile_elems)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q_c.astype(jnp.float32),
                        k_c.astype(jnp.float32)) * scale
    attn = jax.nn.softmax(scores, axis=-1)
    out_c = jnp.einsum("bhqk,bhkd->bhqd", attn,
                       v_c.astype(jnp.float32)).astype(q.dtype)
    # broadcast each tile's coarse output to its tokens
    out_c = jnp.repeat(out_c, tile_elems, axis=2)

    _, top_idx = jax.lax.top_k(scores, topk)  # [b,h,nq,topk]

    if use_pallas:
        out_s = block_sparse_attention(q, k, v, top_idx, block_sizes,
                                       scale=scale, tile_elems=tile_elems)
    else:
        out_s = _sparse_attention_reference(q, k, v, top_idx, block_sizes,
                                            scale, tile_elems)

    if gate_compress is not None:
        return out_c * gate_compress + out_s
    return out_c + out_s
