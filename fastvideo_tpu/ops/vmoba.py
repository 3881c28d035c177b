"""VMOBA — Video Mixture-of-Block Attention.

Behavioral reference: /root/reference/fastvideo/attention/backends/
vmoba.py (:118-202) + fastvideo-kernel/python/fastvideo_kernel/vmoba.py
(:570-900): keys are chunked (temporal / spatial / spatio-temporal
layouts rotate per layer); a gate (mean-pooled chunk keys . query) picks
chunks PER (head, query token) — top-k or cumulative-similarity
threshold — and each token attends its own chunk plus its selected
chunks, combined with exact LSE normalization.

TPU note: per-token chunk membership defeats block-uniform gather
kernels (Mosaic tiles want one kv set per 8-row query group), so this
runs as a flash-style ``lax.scan`` over chunks with the per-token mask
applied inside the running-softmax update — exact math, bounded memory
(never materializes S x S), but no FLOP savings over dense; use VSA /
NABLA / BSA when block-uniform sparsity fits the model.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def chunk_reorder(x: Array, patch_resolution: tuple[int, int, int],
                  chunk_size) -> tuple[Array, int]:
    """Reorder [B, S, H, D] tokens chunk-contiguously (reference
    process_moba_input): int -> temporal (t-major already), (ch, cw) ->
    spatial chunks spanning all frames, (ct, ch, cw) -> 3D chunks."""
    t, h, w = patch_resolution
    b, s, nh, d = x.shape
    assert s == t * h * w
    if isinstance(chunk_size, (int, float)):
        return x, int(chunk_size * h * w)
    if len(chunk_size) == 2:
        ch, cw = chunk_size
        nch, ncw = h // ch, w // cw
        y = x.reshape(b, t, nch, ch, ncw, cw, nh, d)
        y = y.transpose(0, 2, 4, 1, 3, 5, 6, 7)
        return y.reshape(b, s, nh, d), t * ch * cw
    ct, ch, cw = chunk_size
    nct, nch, ncw = t // ct, h // ch, w // cw
    y = x.reshape(b, nct, ct, nch, ch, ncw, cw, nh, d)
    y = y.transpose(0, 1, 3, 5, 2, 4, 6, 7, 8)
    return y.reshape(b, s, nh, d), ct * ch * cw


def chunk_restore(x: Array, patch_resolution: tuple[int, int, int],
                  chunk_size) -> Array:
    """Inverse of chunk_reorder (reference process_moba_output)."""
    t, h, w = patch_resolution
    b, s, nh, d = x.shape
    if isinstance(chunk_size, (int, float)):
        return x
    if len(chunk_size) == 2:
        ch, cw = chunk_size
        nch, ncw = h // ch, w // cw
        y = x.reshape(b, nch, ncw, t, ch, cw, nh, d)
        y = y.transpose(0, 3, 1, 4, 2, 5, 6, 7)
        return y.reshape(b, s, nh, d)
    ct, ch, cw = chunk_size
    nct, nch, ncw = t // ct, h // ch, w // cw
    y = x.reshape(b, nct, nch, ncw, ct, ch, cw, nh, d)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7, 8)
    return y.reshape(b, s, nh, d)


def vmoba_gate_mask(q: Array, k: Array, chunk_len: int, topk: int,
                    select_mode: str = "threshold",
                    threshold: float = 0.25) -> Array:
    """Per-(B, H, token, chunk) boolean selection INCLUDING the self
    chunk (reference moba_attn_varlen gate logic, query_head type)."""
    b, s, h, d = q.shape
    nc = s // chunk_len
    key_gate = jnp.mean(
        k.astype(jnp.float32).reshape(b, nc, chunk_len, h, d), axis=2)
    gate = jnp.einsum("bshd,bchd->bhsc", q.astype(jnp.float32), key_gate)
    tok_chunk = jnp.arange(s) // chunk_len
    self_mask = tok_chunk[None, None, :, None] == jnp.arange(nc)[None, None,
                                                                 None, :]
    if select_mode == "topk":
        # self chunk amplified so it always ranks in the top-k
        amp = jnp.where(self_mask, 1e9, 0.0)
        topk = min(topk, nc)
        _, idx = jax.lax.top_k(gate + amp, topk)
        mask = jnp.zeros(gate.shape, bool)
        mask = jnp.put_along_axis(mask, idx, True, axis=-1,
                                  inplace=False)
    elif select_mode == "threshold":
        # keep the smallest prefix of sorted gates whose softmax mass
        # reaches `threshold` (reference _select_threshold_query_head)
        p = jax.nn.softmax(gate, axis=-1)
        order = jnp.argsort(-p, axis=-1)
        sp = jnp.take_along_axis(p, order, axis=-1)
        cs = jnp.cumsum(sp, axis=-1)
        keep_sorted = jnp.concatenate(
            [jnp.ones_like(cs[..., :1], bool), cs[..., :-1] < threshold],
            axis=-1)
        inv = jnp.argsort(order, axis=-1)
        mask = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    else:
        raise ValueError(f"Invalid select_mode: {select_mode}")
    return mask | self_mask


def vmoba_attention(q: Array, k: Array, v: Array, *,
                    patch_resolution: tuple[int, int, int],
                    chunk_size, topk: int = 4,
                    select_mode: str = "threshold",
                    threshold: float = 0.25,
                    scale: float | None = None) -> Array:
    """Full VMOBA forward on raster-ordered [B, S, H, D]."""
    b, s, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qc, chunk_len = chunk_reorder(q, patch_resolution, chunk_size)
    kc, _ = chunk_reorder(k, patch_resolution, chunk_size)
    vc, _ = chunk_reorder(v, patch_resolution, chunk_size)
    assert s % chunk_len == 0, (s, chunk_len)
    nc = s // chunk_len

    mask = vmoba_gate_mask(qc, kc, chunk_len, topk, select_mode, threshold)

    qt = qc.transpose(0, 2, 1, 3).astype(jnp.float32)  # [B,H,S,D]
    kch = kc.transpose(0, 2, 1, 3).reshape(b, h, nc, chunk_len, d)
    vch = vc.transpose(0, 2, 1, 3).reshape(b, h, nc, chunk_len, d)
    mask_c = mask.transpose(0, 1, 3, 2)  # [B,H,nc,S]

    def body(carry, inp):
        m_prev, l_prev, acc = carry
        kb, vb, allowed = inp  # [B,H,L,D], [B,H,L,D], [B,H,S]
        sres = jnp.einsum("bhsd,bhld->bhsl", qt,
                          kb.astype(jnp.float32)) * scale
        sres = jnp.where(allowed[..., None], sres, -jnp.inf)
        m_curr = jnp.max(sres, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        # masked-out chunks contribute exp(-inf)=0; guard the -inf carry
        alpha = jnp.exp(jnp.where(m_prev == -jnp.inf, -jnp.inf,
                                  m_prev - m_next))
        alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)
        p = jnp.exp(jnp.where(sres == -jnp.inf, -jnp.inf, sres - m_next))
        p = jnp.where(jnp.isnan(p), 0.0, p)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhsl,bhld->bhsd", p,
                                       vb.astype(jnp.float32))
        return (m_next, l_next, acc), None

    m0 = jnp.full((b, h, s, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, s, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, s, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        body, (m0, l0, acc0),
        (kch.transpose(2, 0, 1, 3, 4), vch.transpose(2, 0, 1, 3, 4),
         mask_c.transpose(2, 0, 1, 3)))
    out = (acc / jnp.maximum(l, 1e-20)).astype(q.dtype)
    out = out.transpose(0, 2, 1, 3)
    return chunk_restore(out, patch_resolution, chunk_size)
