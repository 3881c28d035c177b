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
_LANE = 128


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


@functools.lru_cache(maxsize=64)
def select_vsa_tile(dit_seq_shape: tuple[int, int, int],
                    min_elems: int = 128,
                    max_elems: int = 640) -> tuple[int, int, int] | None:
    """Pick a tile geometry that divides the token grid EXACTLY.

    Exact division makes the tile permutation a pure reshape/transpose
    (copy-speed on TPU, vs ~30 ms for an index scatter at production
    shapes) and removes all intra-tile padding, so the sparse kernel needs
    no validity masking and the linears see no extra tokens. Preference:
    tile-token count closest to 256 (MXU-sized 256-row blocks / 64 KB KV
    DMAs), tie-broken toward more-cubic tiles. Returns None when the grid
    has no suitable divisors (caller falls back to the padded (4,8,8)
    scatter layout). The reference's (4,4,4) cubes
    (video_sparse_attn.py:28-58) are a CUDA-warp geometry; on TPU the tile
    is a free parameter of the same algorithm.
    """
    T, H, W = dit_seq_shape

    def divisors(n, cap=32):
        return [d for d in range(1, min(n, cap) + 1) if n % d == 0]

    best = None
    for ts in divisors(T, 21):
        for hs in divisors(H):
            for ws in divisors(W):
                elems = ts * hs * ws
                if elems % 8 != 0 or not min_elems <= elems <= max_elems:
                    continue
                nb = (T // ts) * (H // hs) * (W // ws)
                if nb < 4:
                    continue
                # prefer ~256 tokens/tile, then squarer spatial footprint
                score = (abs(elems - 256), abs(hs - ws), -ts)
                if best is None or score < best[0]:
                    best = (score, (ts, hs, ws))
    return best[1] if best else None


def tile_tokens_exact(x: Array, dit_seq_shape: tuple[int, int, int],
                      tile_size: tuple[int, int, int]) -> Array:
    """[B, S, ...] raster order -> tile-major order via reshape/transpose.

    Requires ``tile_size`` to divide ``dit_seq_shape`` exactly. Identical
    ordering to :func:`tile_tokens` (tiles enumerated t-major, raster order
    within each tile) but runs at copy speed.
    """
    T, H, W = dit_seq_shape
    ts, hs, ws = tile_size
    assert T % ts == 0 and H % hs == 0 and W % ws == 0
    b = x.shape[0]
    feat = x.shape[2:]
    x = x.reshape(b, T // ts, ts, H // hs, hs, W // ws, ws, *feat)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6,
                    *range(7, 7 + len(feat)))
    return x.reshape(b, T * H * W, *feat)


def untile_tokens_exact(x: Array, dit_seq_shape: tuple[int, int, int],
                        tile_size: tuple[int, int, int]) -> Array:
    """Inverse of :func:`tile_tokens_exact`."""
    T, H, W = dit_seq_shape
    ts, hs, ws = tile_size
    b = x.shape[0]
    feat = x.shape[2:]
    x = x.reshape(b, T // ts, H // hs, W // ws, ts, hs, ws, *feat)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6,
                    *range(7, 7 + len(feat)))
    return x.reshape(b, T * H * W, *feat)


@functools.lru_cache(maxsize=32)
def tile_valid_mask(dit_seq_shape: tuple[int, int, int],
                    tile_size: tuple[int, int, int] = VSA_TILE_SIZE):
    """[S_pad] bool numpy mask: True where a tiled slot holds a real token.

    Used by the pre-tiled (hoisted permutation) path: tokens flow through
    the whole transformer in tile-major order, so tile-padding slots carry
    garbage activations (bias terms etc.) and must be zeroed before they
    enter the attention reductions (block_mean / kv)."""
    _, _, block_sizes, _, padded = tile_layout(tuple(dit_seq_shape),
                                               tuple(tile_size))
    elems = tile_size[0] * tile_size[1] * tile_size[2]
    pos = np.arange(padded)
    return (pos % elems) < block_sizes[pos // elems]


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


# -- Pallas block-sparse kernel (flash-style, BlockSpec-gathered KV) --------
#
# The manual-DMA gather kernel below (block_sparse_attention) runs ~1 us per
# tile visit — the serial wait->matmul->softmax->rescale chain never
# overlaps across iterations. This variant mirrors the dense flash kernel's
# structure instead: grid (b, h, q_tile, j) with the selected KV tile
# fetched by Mosaic's OWN pipeline via a scalar-prefetched index in the
# BlockSpec index map (the paged-attention pattern). Mosaic double-buffers
# the gather DMAs against compute automatically, reaching dense-flash
# efficiency on the sparse FLOPs. Requires full tiles (no intra-tile
# padding): use with exact-divide geometries from select_vsa_tile.


def _sparse_fast_kernel(idx_ref, q_ref, *rest, scale: float, topk: int,
                        unroll: int, pad: int):
    """rest = k_0, v_0, ..., k_{u-1}, v_{u-1}, o_ref, m, l, acc."""
    kv_refs = rest[:2 * unroll]
    o_ref, m_ref, l_ref, acc_ref = rest[2 * unroll:]
    j = pl.program_id(3)
    nsteps = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    # one wide [E, u*E] score matmul + one [u*E, D] pv matmul per grid step:
    # per-step work amortizes Mosaic's fixed grid-step cost (~1.5 us), which
    # dominates at single-tile granularity.
    k = jnp.concatenate([kv_refs[2 * c][0, 0] for c in range(unroll)], axis=0)
    v = jnp.concatenate([kv_refs[2 * c + 1][0, 0] for c in range(unroll)],
                        axis=0)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if pad:  # tail chunk masking (duplicate-index padding) — static check
        # Valid chunks are a PREFIX of each row: chunk c of grid step j is
        # valid iff j*unroll + c < topk, i.e. col < (topk - j*unroll)*E_kv
        # — one iota + compare, no per-element integer divide (measured: the
        # // by a non-power-of-2 chunk width cost ~VPU-milliseconds/layer).
        # Chunk width = KV TILE rows (kv block shape), NOT the query rows:
        # with q_group > 1 the q block is q_group*tile_elems rows while
        # each gathered KV chunk is tile_elems rows, and masking by the
        # wrong width let duplicate-padded tail chunks through unmasked.
        e_kv = kv_refs[0].shape[2]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < (topk - j * unroll) * e_kv, s, MASK_VALUE)
    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = m_next
    pv = jax.lax.dot(p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    @pl.when(j == nsteps - 1)
    def _store():
        l = l_ref[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def block_sparse_attention_fast(q: Array, k: Array, v: Array, indices: Array,
                                *, scale: float | None = None,
                                tile_elems: int = TILE_ELEMS,
                                unroll: int | None = None) -> Array:
    """Block-sparse attention over FULL tiles (no intra-tile padding).

    q/k/v: [B, H, nB*E, D] tile-major; indices: [B, H, nG, K] int32 kv-tile
    ids per query GROUP (all valid — no sentinel padding). A query group is
    ``nB // nG`` consecutive tiles sharing one top-k set (q-grouping trades
    selection granularity for a G-fold cut in gather DMA volume — the
    binding constraint on TPU). ``unroll`` KV tiles are gathered per grid
    step through separate BlockSpec operands (Mosaic pipelines the DMAs)
    and reduced with one wide matmul.
    """
    b, h, s, d = q.shape
    nb = s // tile_elems
    ng = indices.shape[2]
    assert nb % ng == 0, (nb, ng)
    q_rows = (nb // ng) * tile_elems  # q rows per grid step
    topk = indices.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if unroll is None:
        # target ~2048 kv rows per grid step, preferring an exact divisor
        # of topk: pad=0 drops the per-step tail masking entirely (the
        # production 0.8-sparsity shapes all hit a divisor).
        budget = max(1, min(topk, 2048 // tile_elems))
        divisor = max((u for u in range(1, budget + 1) if topk % u == 0),
                      default=1)
        unroll = divisor if divisor * 2 > budget else budget
    nsteps = -(-topk // unroll)
    pad = nsteps * unroll - topk
    if pad:
        # duplicate-pad the index tail; the kernel masks those chunks.
        indices = jnp.concatenate(
            [indices, jnp.repeat(indices[..., -1:], pad, axis=-1)], axis=-1)

    kernel = functools.partial(_sparse_fast_kernel, scale=scale, topk=topk,
                               unroll=unroll, pad=pad)

    def kv_spec(c):
        return pl.BlockSpec(
            (1, 1, tile_elems, d),
            lambda b_, h_, qi, j, idx, c=c: (b_, h_, idx[b_, h_, qi,
                                                         j * unroll + c], 0))

    def run(qh, kh, vh, idxh):
        hh = qh.shape[1]
        in_specs = [
            pl.BlockSpec((1, 1, q_rows, d),
                         lambda b_, h_, qi, j, idx: (b_, h_, qi, 0)),
        ]
        for c in range(unroll):
            in_specs.append(kv_spec(c))
            in_specs.append(kv_spec(c))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hh, ng, nsteps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, q_rows, d),
                                   lambda b_, h_, qi, j, idx: (b_, h_, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((q_rows, _LANE), jnp.float32),  # m
                pltpu.VMEM((q_rows, _LANE), jnp.float32),  # l
                pltpu.VMEM((q_rows, d), jnp.float32),      # acc
            ],
        )
        operands = [idxh, qh]
        for _ in range(unroll):
            operands.append(kh)
            operands.append(vh)
        return pl.pallas_call(
            kernel,
            interpret=_use_interpret(),
            out_shape=jax.ShapeDtypeStruct(qh.shape, qh.dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=4 * hh * s * topk * tile_elems * d,
                bytes_accessed=2 * hh * s * d * 4,
                transcendentals=hh * s * topk * tile_elems,
            ),
        )(*operands)

    # One pallas_call over ALL heads (grid (b, h, ng, nsteps), full [b,h,..]
    # index array prefetched): Mosaic pipelines gather DMAs across head
    # boundaries and the dispatch cost is paid once, not h times. Fall back
    # to per-head calls only when the index array would crowd SMEM.
    idx_all = indices.astype(jnp.int32)
    if idx_all.size * 4 <= SCALAR_PREFETCH_SMEM_BUDGET_BYTES:
        try:
            return run(q, k, v, idx_all)
        except Exception:  # SMEM overflow on a smaller part: per-head path
            pass
    outs = []
    for hi in range(h):
        sl = slice(hi, hi + 1)
        outs.append(run(q[:, sl], k[:, sl], v[:, sl], idx_all[:, sl]))
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


# -- Pallas block-sparse kernel (manual-DMA gather; handles padded tiles) ---


SPARSE_PIPELINE_SLOTS = 4

# Scalar-prefetch arrays live in SMEM alongside Mosaic's own bookkeeping.
# 256 KB is an empirical safe bound for the ~1 MB SMEM of the v5e this was
# tuned on; if it overestimates another part's SMEM the all-heads call
# fails to compile and the caller retries per-head (see the fast path).
SCALAR_PREFETCH_SMEM_BUDGET_BYTES = 256 * 1024


def _sparse_kernel(sizes_ref, idx_ref, q_ref, k_hbm, v_hbm, o_ref, acc_ref,
                   k_buf, v_buf, sems, *, scale: float, topk: int,
                   tile_elems: int):
    """Paged-attention-style gather: per query tile, DMA its top-k KV tiles
    from HBM through a 4-deep buffer pipeline (guide: paged attention /
    double buffering patterns). The gather is DMA-LATENCY bound — each
    tile visit's matmuls take ~0.2 us while an HBM gather costs ~0.8 us —
    so keeping 3 fetches in flight (not 1) is worth ~2x end-to-end
    (measured 70 ms -> see STATUS) at the production 168-tile shape.
    Indices arrive as an (8, topk_pad128)-aligned SMEM block covering 8
    query tiles — a full scalar-prefetch array overflows SMEM at
    production tile counts, and unaligned per-row DMA violates Mosaic's
    (8, 128) slice tiling."""
    ns = SPARSE_PIPELINE_SLOTS
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

    for j0 in range(min(ns - 1, topk)):
        dma_k(j0, j0).start()
        dma_v(j0, j0).start()

    q = q_ref[0, 0]  # [E, D]

    def body(j, carry):
        m_prev, l_prev = carry
        slot = jax.lax.rem(j, ns)
        ahead = j + ns - 1
        ahead_slot = jax.lax.rem(ahead, ns)

        @pl.when(ahead < topk)
        def _prefetch():
            dma_k(ahead_slot, ahead).start()
            dma_v(ahead_slot, ahead).start()

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
            pltpu.VMEM((SPARSE_PIPELINE_SLOTS, tile_elems, d), k.dtype),
            pltpu.VMEM((SPARSE_PIPELINE_SLOTS, tile_elems, d), v.dtype),
            pltpu.SemaphoreType.DMA((SPARSE_PIPELINE_SLOTS, 2)),
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
    full_tiles: bool = False,
    q_group: int = 1,
) -> Array:
    """VSA over tiled [B, H, S_pad, D] tensors (reference ops.py:69-145).

    ``full_tiles=True`` asserts no intra-tile padding (exact-divide
    geometry): the inference forward then runs the flash-style
    BlockSpec-gather kernel; gradients still route through the LSE-emitting
    manual kernels. ``q_group`` selects one shared top-k set per group of
    consecutive query tiles (group coarse scores are averaged), cutting
    gather DMA volume by the group factor."""
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

    if q_group > 1 and full_tiles and nb % q_group == 0:
        # shared selection per q-group: average the group's coarse scores
        scores_sel = scores.reshape(b, h, nb // q_group, q_group,
                                    nb).mean(axis=3)
    else:
        q_group = 1
        scores_sel = scores
    _, top_idx = jax.lax.top_k(scores_sel, topk)  # [b,h,nG,topk]

    if use_pallas and full_tiles:
        out_s = _bsa_fast(q, k, v, jax.lax.stop_gradient(top_idx),
                          block_sizes, scale, topk, tile_elems)
    elif use_pallas:
        # differentiable path: Pallas fwd (with LSE) + Pallas dQ/dKV
        # backward kernels via custom_vjp. Indices come from top_k and
        # carry no gradient (matches the reference CUDA backward).
        out_s = block_sparse_attention_trainable(
            q, k, v, jax.lax.stop_gradient(top_idx), block_sizes,
            scale=scale, tile_elems=tile_elems)
    else:
        if top_idx.shape[2] != nb:
            top_idx = jnp.repeat(top_idx, nb // top_idx.shape[2], axis=2)
        out_s = _sparse_attention_reference(q, k, v, top_idx, block_sizes,
                                            scale, tile_elems)

    if gate_compress is not None:
        return out_c * gate_compress + out_s
    return out_c + out_s


# -- backward kernels ---------------------------------------------------------
#
# The forward gather pattern drives dQ (each q tile revisits its top-k kv
# tiles); dK/dV use the TRANSPOSED sparsity via a dense [nQ, nB] membership
# mask held in SMEM (each kv tile loops the q tiles that selected it,
# skipping non-members cheaply with @pl.when). This mirrors the reference
# CUDA backward split (block_sparse_h100.cu bwd_dq / bwd_dkdv).


def _sparse_fwd_lse_kernel(sizes_ref, idx_ref, q_ref, k_hbm, v_hbm, o_ref,
                           lse_ref, acc_ref, k_buf, v_buf, sems, *,
                           scale: float, topk: int, tile_elems: int):
    """Forward kernel variant that also emits LSE (for the backward)."""
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
    q = q_ref[0, 0]

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
    m, l = jax.lax.fori_loop(0, topk, body, (m0, l0))
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)
    lse = jnp.where(l == 0.0, MASK_VALUE, m + jnp.log(l))
    lse_ref[0, 0] = jnp.broadcast_to(lse, (tile_elems, 128)).astype(
        jnp.float32)


def _sparse_bwd_dq_kernel(sizes_ref, idx_ref, q_ref, do_ref, lse_ref,
                          delta_ref, k_hbm, v_hbm, dq_ref, dq_acc, k_buf,
                          v_buf, sems, *, scale: float, topk: int,
                          tile_elems: int):
    """dQ: same top-k gather as the forward; ds = p * (dP - delta) * scale."""
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
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]
    delta = delta_ref[0, 0][:, :1]
    dq_acc[...] = jnp.zeros_like(dq_acc)

    def body(j, _):
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
        valid = jnp.where(t_j >= 0, sizes_ref[jnp.maximum(t_j, 0)], 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        live = jnp.logical_and(col < valid, lse > MASK_VALUE / 2)
        p = jnp.where(live, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dq_acc[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                   preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, topk, body, 0)
    dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _sparse_bwd_dkv_kernel(sizes_ref, member_ref, k_ref, v_ref, q_hbm,
                           do_hbm, lse_hbm, delta_hbm, dk_ref, dv_ref,
                           dk_acc, dv_acc, q_buf, do_buf, lse_buf, delta_buf,
                           sems, *, scale: float, num_q_tiles: int,
                           tile_elems: int):
    """dK/dV: each kv tile loops the q tiles; the SMEM membership row gates
    DMA + compute, so non-selecting q tiles cost only the predicate."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    kj = pl.program_id(2)
    row = jax.lax.rem(kj, 8)

    k = k_ref[0, 0]
    v = v_ref[0, 0]
    valid = sizes_ref[kj]
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    def member(qi):
        return member_ref[0, 0, row, qi] > 0

    def dma_all(qi):
        base = qi * tile_elems
        return (
            pltpu.make_async_copy(
                q_hbm.at[b, h, pl.ds(base, tile_elems), :], q_buf,
                sems.at[0]),
            pltpu.make_async_copy(
                do_hbm.at[b, h, pl.ds(base, tile_elems), :], do_buf,
                sems.at[1]),
            pltpu.make_async_copy(
                lse_hbm.at[b, h, pl.ds(base, tile_elems), :], lse_buf,
                sems.at[2]),
            pltpu.make_async_copy(
                delta_hbm.at[b, h, pl.ds(base, tile_elems), :], delta_buf,
                sems.at[3]),
        )

    def body(qi, _):
        @pl.when(member(qi))
        def _compute():
            copies = dma_all(qi)
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            q = q_buf[...]
            do = do_buf[...]
            lse = lse_buf[:, :1]
            delta = delta_buf[:, :1]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ) * scale
            colv = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            live = jnp.logical_and(colv < valid, lse > MASK_VALUE / 2)
            p = jnp.where(live, jnp.exp(s - lse), 0.0)
            # dV += P^T dO
            dv_acc[...] += jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - delta) * scale
            # dK += dS^T Q
            dk_acc[...] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_q_tiles, body, 0)
    dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _block_sparse_fwd_lse(q, k, v, idx, block_sizes, *, scale, topk,
                          tile_elems):
    b, h, s, d = q.shape
    nq = s // tile_elems
    nq_pad = math.ceil(nq / 8) * 8
    topk_pad = idx.shape[-1]
    kernel = functools.partial(_sparse_fwd_lse_kernel, scale=scale,
                               topk=topk, tile_elems=tile_elems)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, 8, topk_pad),
                         lambda b, h, qi, sz: (b, h, qi // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tile_elems, d),
                         lambda b, h, qi, sz: (b, h, qi, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_elems, d),
                         lambda b, h, qi, sz: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, tile_elems, 128),
                         lambda b, h, qi, sz: (b, h, qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_elems, d), jnp.float32),
            pltpu.VMEM((2, tile_elems, d), k.dtype),
            pltpu.VMEM((2, tile_elems, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        interpret=_use_interpret(),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, s, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(block_sizes.astype(jnp.int32), idx, q, k, v)
    return out, lse


def _block_sparse_bwd(q, k, v, idx, block_sizes, out, lse, do, *, scale,
                      topk, tile_elems):
    b, h, s, d = q.shape
    nq = s // tile_elems
    nb = s // tile_elems
    nq_pad = math.ceil(nq / 8) * 8
    topk_pad = idx.shape[-1]

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (b, h, s, 128)).astype(jnp.float32)

    dq_kernel = functools.partial(_sparse_bwd_dq_kernel, scale=scale,
                                  topk=topk, tile_elems=tile_elems)
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, 8, topk_pad),
                         lambda b, h, qi, sz: (b, h, qi // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tile_elems, d),
                         lambda b, h, qi, sz: (b, h, qi, 0)),  # q
            pl.BlockSpec((1, 1, tile_elems, d),
                         lambda b, h, qi, sz: (b, h, qi, 0)),  # do
            pl.BlockSpec((1, 1, tile_elems, 128),
                         lambda b, h, qi, sz: (b, h, qi, 0)),  # lse
            pl.BlockSpec((1, 1, tile_elems, 128),
                         lambda b, h, qi, sz: (b, h, qi, 0)),  # delta
            pl.BlockSpec(memory_space=pltpu.ANY),  # k
            pl.BlockSpec(memory_space=pltpu.ANY),  # v
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
    dq = pl.pallas_call(
        dq_kernel,
        interpret=_use_interpret(),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=dq_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(block_sizes.astype(jnp.int32), idx, q, do, lse, delta, k, v)

    # membership matrix: member[b, h, kv_tile, q_tile] (transposed sparsity)
    nb_idx = jnp.where(idx[:, :, :nq, :topk] >= 0,
                       idx[:, :, :nq, :topk], nb)
    member = jnp.zeros((b, h, nb + 1, nq), jnp.int32)
    member = member.at[
        jnp.arange(b)[:, None, None, None],
        jnp.arange(h)[None, :, None, None],
        nb_idx,
        jnp.arange(nq)[None, None, :, None]].set(1)
    member = member[:, :, :nb]
    nb_pad = math.ceil(nb / 8) * 8
    nq_pad128 = math.ceil(nq / 128) * 128
    member_pad = jnp.zeros((b, h, nb_pad, nq_pad128), jnp.int32)
    member_pad = member_pad.at[:, :, :nb, :nq].set(member)

    dkv_kernel = functools.partial(_sparse_bwd_dkv_kernel, scale=scale,
                                   num_q_tiles=nq, tile_elems=tile_elems)
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 8, nq_pad128),
                         lambda b, h, kj, sz: (b, h, kj // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tile_elems, d),
                         lambda b, h, kj, sz: (b, h, kj, 0)),  # k
            pl.BlockSpec((1, 1, tile_elems, d),
                         lambda b, h, kj, sz: (b, h, kj, 0)),  # v
            pl.BlockSpec(memory_space=pltpu.ANY),  # q
            pl.BlockSpec(memory_space=pltpu.ANY),  # do
            pl.BlockSpec(memory_space=pltpu.ANY),  # lse
            pl.BlockSpec(memory_space=pltpu.ANY),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_elems, d),
                         lambda b, h, kj, sz: (b, h, kj, 0)),
            pl.BlockSpec((1, 1, tile_elems, d),
                         lambda b, h, kj, sz: (b, h, kj, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_elems, d), jnp.float32),
            pltpu.VMEM((tile_elems, d), jnp.float32),
            pltpu.VMEM((tile_elems, d), q.dtype),
            pltpu.VMEM((tile_elems, d), do.dtype),
            pltpu.VMEM((tile_elems, 128), jnp.float32),
            pltpu.VMEM((tile_elems, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        interpret=_use_interpret(),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        grid_spec=dkv_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(block_sizes.astype(jnp.int32), member_pad, k, v, q, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _block_sparse_attention_vjp(q, k, v, idx, block_sizes, scale, topk,
                                tile_elems):
    out, _ = _block_sparse_fwd_lse(q, k, v, idx, block_sizes, scale=scale,
                                   topk=topk, tile_elems=tile_elems)
    return out


def _bsa_vjp_fwd(q, k, v, idx, block_sizes, scale, topk, tile_elems):
    out, lse = _block_sparse_fwd_lse(q, k, v, idx, block_sizes, scale=scale,
                                     topk=topk, tile_elems=tile_elems)
    return out, (q, k, v, idx, block_sizes, out, lse)


def _bsa_vjp_bwd(scale, topk, tile_elems, res, do):
    q, k, v, idx, block_sizes, out, lse = res
    dq, dk, dv = _block_sparse_bwd(q, k, v, idx, block_sizes, out, lse, do,
                                   scale=scale, topk=topk,
                                   tile_elems=tile_elems)
    return dq, dk, dv, None, None


_block_sparse_attention_vjp.defvjp(_bsa_vjp_fwd, _bsa_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _bsa_fast(q, k, v, idx, block_sizes, scale, topk, tile_elems):
    """Inference primal = flash-style gather kernel; grad path reuses the
    LSE-emitting manual kernels (full tiles make their masking a no-op)."""
    del block_sizes
    return block_sparse_attention_fast(q, k, v, idx, scale=scale,
                                       tile_elems=tile_elems)


def _bsa_fast_fwd(q, k, v, idx, block_sizes, scale, topk, tile_elems):
    b, h, s, _ = q.shape
    nq = s // tile_elems
    if idx.shape[2] != nq:
        # grouped selection -> expand to per-tile for the manual kernels
        idx = jnp.repeat(idx, nq // idx.shape[2], axis=2)
    nq_pad = math.ceil(nq / 8) * 8
    topk_pad = math.ceil(topk / 128) * 128
    idx_pad = jnp.zeros((b, h, nq_pad, topk_pad), jnp.int32)
    idx_pad = idx_pad.at[:, :, :nq, :topk].set(idx.astype(jnp.int32))
    out, lse = _block_sparse_fwd_lse(q, k, v, idx_pad, block_sizes,
                                     scale=scale, topk=topk,
                                     tile_elems=tile_elems)
    return out, (q, k, v, idx_pad, block_sizes, out, lse)


_bsa_fast.defvjp(_bsa_fast_fwd, _bsa_vjp_bwd)


def block_sparse_attention_trainable(q, k, v, indices, block_sizes, *,
                                     scale=None, tile_elems=TILE_ELEMS):
    """Differentiable block-sparse attention (Pallas fwd + bwd kernels).

    Same contract as :func:`block_sparse_attention`; gradients flow to
    q/k/v (indices come from argmax/top_k and carry no gradient, matching
    the reference CUDA backward)."""
    b, h, s, d = q.shape
    nq = s // tile_elems
    topk = indices.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    nq_pad = math.ceil(nq / 8) * 8
    topk_pad = math.ceil(topk / 128) * 128
    idx = jnp.zeros((b, h, nq_pad, topk_pad), jnp.int32)
    idx = idx.at[:, :, :nq, :topk].set(indices.astype(jnp.int32))
    return _block_sparse_attention_vjp(q, k, v, idx, block_sizes, scale,
                                       topk, tile_elems)
