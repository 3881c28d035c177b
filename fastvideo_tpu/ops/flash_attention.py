"""Flash attention forward kernel for TPU (Pallas/Mosaic).

TPU-native replacement for the reference's FlashAttention-2/3 CUDA dependency
(/root/reference/fastvideo/attention/backends/flash_attn.py). Online-softmax
tiling keeps the (S, S) score matrix out of HBM; statistics (m, l) and the
output accumulator live in VMEM scratch across KV tiles.

Layout: [batch, heads, seq, head_dim]; grid (b, h, q_tile, kv_tile) with the
KV dimension innermost/"arbitrary" (sequential online-softmax reduction) and
all others "parallel" so Mosaic can split them over megacores.

Padding: callers pad seq to a block multiple; `q_len`/`kv_len` mask the tail
(static ints — shapes are static under jit anyway). The backward pass is a
custom VJP that recomputes attention probabilities per KV tile (flash-style)
as a second Pallas kernel pair.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _use_interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU (tests).
    return jax.default_backend() == "cpu"

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_MIN_LANE = 128


def _mask_tile(mask, qi: int, kj: int, block_q: int, block_kv: int,
               causal: bool, chunk_tokens: int, tf_clean_len: int):
    """Combine the structural mask for one (q, kv) tile onto ``mask``.

    chunk_tokens > 0 switches causal to chunk granularity (blockwise-causal
    attention of the causal Wan student, reference
    causal_wanvideo.py:436-502); tf_clean_len > 0 additionally applies the
    teacher-forcing ``[clean | noisy]`` mask (causal_wanvideo.py:504-565):
    clean tokens are chunk-causal among themselves, a noisy token attends
    its own noisy chunk plus the clean context of strictly previous chunks.
    """
    shape = (block_q, block_kv)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + kj * block_kv
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + qi * block_q
    if tf_clean_len > 0:
        ct = chunk_tokens
        s_len = tf_clean_len
        q_clean = row < s_len
        cq_noisy = (row - s_len) // ct
        clean_ok = q_clean & (col < s_len) & (col // ct <= row // ct)
        noisy_own = (col >= s_len) & ((col - s_len) // ct == cq_noisy)
        noisy_ctx = (col < s_len) & (col // ct < cq_noisy)
        noisy_ok = (~q_clean) & (noisy_own | noisy_ctx)
        return mask & (clean_ok | noisy_ok)
    if chunk_tokens > 0:
        return mask & (col // chunk_tokens <= row // chunk_tokens)
    if causal:
        return mask & (col <= row)
    return mask


def _tile_reachable(qi, kj, block_q: int, block_kv: int, causal: bool,
                    chunk_tokens: int, tf_clean_len: int):
    """Predicate: this kv tile has any unmasked element for this q tile."""
    if tf_clean_len > 0:
        # Noisy rows reach forward only within their own chunk, whose end
        # is bounded by chunk_end of the last row; clean rows reach
        # backwards only. A tile is reachable iff its first col is below
        # the last row's chunk end (in its own half).
        ct = chunk_tokens
        row_max = (qi + 1) * block_q - 1
        s_len = tf_clean_len
        # last row may be clean or noisy; bound both halves
        noisy_end = s_len + (jnp.maximum(row_max - s_len, 0) // ct + 1) * ct
        clean_end = (row_max // ct + 1) * ct
        return kj * block_kv < jnp.maximum(noisy_end, clean_end)
    if chunk_tokens > 0:
        row_max = (qi + 1) * block_q - 1
        return kj * block_kv < (row_max // chunk_tokens + 1) * chunk_tokens
    if causal:
        return kj * block_kv <= (qi + 1) * block_q - 1
    return None


def _fwd_kernel(q_ref, k_ref, v_ref, *rest,
                scale: float, causal: bool, q_valid: int, kv_valid: int,
                block_q: int, block_kv: int, num_kv_blocks: int,
                chunk_tokens: int = 0, tf_clean_len: int = 0,
                has_kv_mask: bool = False):
    if has_kv_mask:
        # dynamic per-key validity: shape-static [1, skv] int32 whose VALUES
        # are traced (KV-cache fill counters) — the static _mask_tile
        # machinery cannot express it without a recompile per stream block
        kv_mask_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    qi = pl.program_id(2)
    kj = pl.program_id(3)

    @pl.when(kj == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def _body():
        q = q_ref[0, 0]  # [block_q, D]
        k = k_ref[0, 0]  # [block_kv, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s *= scale

        # Tail / causal / structural masking.
        need_kv_mask = kv_valid % block_kv != 0 or kv_valid != pl.num_programs(
            3) * block_kv
        if causal or chunk_tokens or tf_clean_len or need_kv_mask \
                or has_kv_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv),
                                           1) + kj * block_kv
            mask = col < kv_valid
            mask = _mask_tile(mask, qi, kj, block_q, block_kv, causal,
                              chunk_tokens, tf_clean_len)
            if has_kv_mask:
                mask = mask & (kv_mask_ref[0] != 0)[None, :]
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[...]  # [block_q, 128]
        l_prev = l_ref[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast to [block_q, 128]
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_next
        l_ref[...] = l_next

        v = v_ref[0, 0]  # [block_kv, D]
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    reach = _tile_reachable(qi, kj, block_q, block_kv, causal, chunk_tokens,
                            tf_clean_len)
    if reach is not None:
        # Skip KV tiles with no unmasked element.
        @pl.when(reach)
        def _run():
            _body()
    else:
        _body()

    @pl.when(kj == num_kv_blocks - 1)
    def _store():
        l = l_ref[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)
        m = m_ref[...][:, :1]
        lse_ref[0, 0] = (m + jnp.log(jnp.maximum(l, 1e-30))) * jnp.ones(
            (1, _MIN_LANE), jnp.float32)


def _pad_to(x: Array, size: int, axis: int) -> Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_kv", "kv_valid",
                     "chunk_tokens", "tf_clean_len"))
def _flash_attention_fwd_bhsd(q: Array, k: Array, v: Array,
                              kv_mask: Array | None = None, *, scale: float,
                              causal: bool, block_q: int, block_kv: int,
                              kv_valid: int, chunk_tokens: int = 0,
                              tf_clean_len: int = 0) -> Array:
    b, h, sq, d = q.shape
    skv = k.shape[2]
    q_pad = math.ceil(sq / block_q) * block_q
    kv_pad = math.ceil(skv / block_kv) * block_kv
    qp = _pad_to(q, q_pad, 2)
    kp = _pad_to(k, kv_pad, 2)
    vp = _pad_to(v, kv_pad, 2)
    num_q_blocks = q_pad // block_q
    num_kv_blocks = kv_pad // block_kv

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        causal=causal,
        q_valid=sq,
        kv_valid=kv_valid,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        chunk_tokens=chunk_tokens,
        tf_clean_len=tf_clean_len,
        has_kv_mask=kv_mask is not None,
    )
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, d), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_kv, d), lambda b, h, i, j: (b, h, j, 0)),
    ]
    operands = [qp, kp, vp]
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((1, block_kv),
                                     lambda b, h, i, j: (0, j)))
        operands.append(_pad_to(
            kv_mask.reshape(1, -1).astype(jnp.int32), kv_pad, 1))
    out, lse = pl.pallas_call(
        kernel,
        interpret=_use_interpret(),
        out_shape=(jax.ShapeDtypeStruct((b, h, q_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, q_pad, _MIN_LANE),
                                        jnp.float32)),
        grid=(b, h, num_q_blocks, num_kv_blocks),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, 1, block_q, d),
                                lambda b, h, i, j: (b, h, i, 0)),
                   pl.BlockSpec((1, 1, block_q, _MIN_LANE),
                                lambda b, h, i, j: (b, h, i, 0))),
        scratch_shapes=[
            pltpu.VMEM((block_q, _MIN_LANE), jnp.float32),  # m
            pltpu.VMEM((block_q, _MIN_LANE), jnp.float32),  # l
            pltpu.VMEM((block_q, d), jnp.float32),  # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * skv * d,
            bytes_accessed=2 * b * h * (sq + 2 * skv) * d,
            transcendentals=b * h * sq * skv,
        ),
    )(*operands)
    return out[:, :, :sq, :], lse[:, :, :, 0]


def _reference_attention(q: Array, k: Array, v: Array, scale: float,
                         causal: bool, kv_valid: int) -> Array:
    """Dense attention in plain XLA ([B,H,S,D]); used for the VJP fallback."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    skv = k.shape[2]
    if kv_valid < skv:
        col = jnp.arange(skv)[None, None, None, :]
        s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)
    if causal:
        qlen = q.shape[2]
        row = jnp.arange(qlen)[:, None]
        col = jnp.arange(skv)[None, :]
        s = jnp.where(col[None, None] <= row[None, None], s,
                      DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(
        q.dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_attention_bhsd(q, k, v, scale, causal, block_q, block_kv,
                          kv_valid, chunk_tokens=0, tf_clean_len=0):
    out, _ = _flash_attention_fwd_bhsd(q, k, v, scale=scale, causal=causal,
                                       block_q=block_q, block_kv=block_kv,
                                       kv_valid=kv_valid,
                                       chunk_tokens=chunk_tokens,
                                       tf_clean_len=tf_clean_len)
    return out


def _vjp_fwd(q, k, v, scale, causal, block_q, block_kv, kv_valid,
             chunk_tokens=0, tf_clean_len=0):
    out, lse = _flash_attention_fwd_bhsd(q, k, v, scale=scale,
                                         causal=causal, block_q=block_q,
                                         block_kv=block_kv,
                                         kv_valid=kv_valid,
                                         chunk_tokens=chunk_tokens,
                                         tf_clean_len=tf_clean_len)
    return out, (q, k, v, out, lse)


def _vjp_bwd(scale, causal, block_q, block_kv, kv_valid, chunk_tokens,
             tf_clean_len, res, g):
    q, k, v, out, lse = res
    return _flash_attention_bwd_bhsd(q, k, v, out, lse, g, scale=scale,
                                     causal=causal, block_q=block_q,
                                     block_kv=block_kv, kv_valid=kv_valid,
                                     chunk_tokens=chunk_tokens,
                                     tf_clean_len=tf_clean_len)


_flash_attention_bhsd.defvjp(_vjp_fwd, _vjp_bwd)


# -- backward kernels --------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_acc, *, scale: float, causal: bool, kv_valid: int,
                   block_q: int, block_kv: int, num_kv_blocks: int,
                   chunk_tokens: int = 0, tf_clean_len: int = 0):
    qi = pl.program_id(2)
    kj = pl.program_id(3)

    @pl.when(kj == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        delta = delta_ref[0, 0][:, :1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kj * block_kv
        mask = col < kv_valid
        mask = _mask_tile(mask, qi, kj, block_q, block_kv, causal,
                          chunk_tokens, tf_clean_len)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dq_acc[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                   preferred_element_type=jnp.float32)

    reach = _tile_reachable(qi, kj, block_q, block_kv, causal, chunk_tokens,
                            tf_clean_len)
    if reach is not None:
        @pl.when(reach)
        def _run():
            _body()
    else:
        _body()

    @pl.when(kj == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref,
                    dv_ref, dk_acc, dv_acc, *, scale: float, causal: bool,
                    kv_valid: int, block_q: int, block_kv: int,
                    num_q_blocks: int, chunk_tokens: int = 0,
                    tf_clean_len: int = 0):
    kj = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        delta = delta_ref[0, 0][:, :1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kj * block_kv
        mask = col < kv_valid
        mask = _mask_tile(mask, qi, kj, block_q, block_kv, causal,
                          chunk_tokens, tf_clean_len)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        # dv += p^T dO ; dk += ds^T q
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    reach = _tile_reachable(qi, kj, block_q, block_kv, causal, chunk_tokens,
                            tf_clean_len)
    if reach is not None:
        @pl.when(reach)
        def _run():
            _body()
    else:
        _body()

    @pl.when(qi == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_kv", "kv_valid",
                     "chunk_tokens", "tf_clean_len"))
def _flash_attention_bwd_bhsd(q, k, v, out, lse, do, *, scale, causal,
                              block_q, block_kv, kv_valid, chunk_tokens=0,
                              tf_clean_len=0):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    q_pad = math.ceil(sq / block_q) * block_q
    kv_pad = math.ceil(skv / block_kv) * block_kv
    qp, dop = _pad_to(q, q_pad, 2), _pad_to(do, q_pad, 2)
    outp = _pad_to(out, q_pad, 2)
    kp, vp = _pad_to(k, kv_pad, 2), _pad_to(v, kv_pad, 2)
    # pad lse with +inf so padded q rows produce p = exp(-inf) = 0
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, q_pad - sq)),
                    constant_values=jnp.inf)
    delta = jnp.sum(dop.astype(jnp.float32) * outp.astype(jnp.float32),
                    axis=-1)  # [b, h, q_pad]
    lse_t = jnp.broadcast_to(lse_p[..., None], (*lse_p.shape, _MIN_LANE))
    delta_t = jnp.broadcast_to(delta[..., None], (*delta.shape, _MIN_LANE))
    num_q_blocks = q_pad // block_q
    num_kv_blocks = kv_pad // block_kv

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                          kv_valid=kv_valid, block_q=block_q,
                          block_kv=block_kv, num_kv_blocks=num_kv_blocks,
                          chunk_tokens=chunk_tokens,
                          tf_clean_len=tf_clean_len),
        interpret=_use_interpret(),
        out_shape=jax.ShapeDtypeStruct((b, h, q_pad, d), q.dtype),
        grid=(b, h, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, _MIN_LANE),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, _MIN_LANE),
                         lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b, h, i, j: (b, h, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(qp, kp, vp, dop, lse_t, delta_t)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, causal=causal,
                          kv_valid=kv_valid, block_q=block_q,
                          block_kv=block_kv, num_q_blocks=num_q_blocks,
                          chunk_tokens=chunk_tokens,
                          tf_clean_len=tf_clean_len),
        interpret=_use_interpret(),
        out_shape=(jax.ShapeDtypeStruct((b, h, kv_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, kv_pad, d), v.dtype)),
        grid=(b, h, num_kv_blocks, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, _MIN_LANE),
                         lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, _MIN_LANE),
                         lambda b, h, j, i: (b, h, i, 0)),
        ],
        out_specs=(pl.BlockSpec((1, 1, block_kv, d),
                                lambda b, h, j, i: (b, h, j, 0)),
                   pl.BlockSpec((1, 1, block_kv, d),
                                lambda b, h, j, i: (b, h, j, 0))),
        scratch_shapes=[pltpu.VMEM((block_kv, d), jnp.float32),
                        pltpu.VMEM((block_kv, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(qp, kp, vp, dop, lse_t, delta_t)

    return dq[:, :, :sq], dk[:, :, :skv], dv[:, :, :skv]


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: float | None = None,
    causal: bool = False,
    block_q: int = 512,
    block_kv: int = 1024,
    kv_valid: int | None = None,
    chunk_tokens: int = 0,
    tf_clean_len: int = 0,
) -> Array:
    """Flash attention over ``[B, S, H, D]`` tensors (returns same layout).

    Args:
      kv_valid: number of real (unpadded) KV tokens; keys at index >= this
        are masked out. Defaults to the full KV length.
      chunk_tokens: > 0 applies blockwise-causal masking at this chunk
        granularity (tokens per causal block) instead of token-level causal.
      tf_clean_len: > 0 applies the teacher-forcing ``[clean | noisy]`` mask
        (requires chunk_tokens; sequence length must be 2 * tf_clean_len).
    """
    if tf_clean_len > 0 and chunk_tokens <= 0:
        # The TF mask divides token indices by chunk_tokens inside the
        # kernel; a zero divisor is defined-garbage on TPU, not an error.
        raise ValueError(
            "tf_clean_len > 0 requires chunk_tokens > 0 (teacher-forcing "
            "masks are chunk-granular)")
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if kv_valid is None:
        kv_valid = skv
    block_q = min(block_q, max(_MIN_LANE, 1 << (sq - 1).bit_length()))
    block_kv = min(block_kv, max(_MIN_LANE, 1 << (skv - 1).bit_length()))
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash_attention_bhsd(qt, kt, vt, float(scale), causal, block_q,
                                block_kv, int(kv_valid), int(chunk_tokens),
                                int(tf_clean_len))
    return out.transpose(0, 2, 1, 3)


def flash_attention_kv_mask(
    q: Array,
    k: Array,
    v: Array,
    kv_mask: Array,
    *,
    scale: float | None = None,
    block_q: int = 512,
    block_kv: int = 1024,
) -> Array:
    """Forward-only flash attention with a DYNAMIC per-key validity mask.

    ``q``/``k``/``v`` are ``[B, S, H, D]``; ``kv_mask`` is ``[S_kv]`` bool
    (or 0/1 int) whose VALUES may be traced — only its shape is static.
    Built for the causal streaming KV-cache attention
    (models/dits/causal_wan.py ``cached_self_attention``), where key
    validity depends on traced cache-fill counters: a dense
    ``dot_product_attention`` with a bias materializes the full
    ``[B, H, Sq, Skv]`` score matrix (~8 GB fp32 per layer at 1.3B/480p
    streaming scale — an instant OOM on a 16 GB chip), while the
    structural-mask `flash_attention` path would recompile per stream
    block. No VJP: inference only (the training path uses the structural
    masks, which skip unreachable tiles and have a Pallas backward).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    sq, skv = q.shape[1], k.shape[1]
    block_q = min(block_q, max(_MIN_LANE, 1 << (sq - 1).bit_length()))
    block_kv = min(block_kv, max(_MIN_LANE, 1 << (skv - 1).bit_length()))
    out, _ = _flash_attention_fwd_bhsd(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), kv_mask, scale=float(scale), causal=False,
        block_q=block_q, block_kv=block_kv, kv_valid=skv)
    return out.transpose(0, 2, 1, 3)
