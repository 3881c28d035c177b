"""Quantization-aware-training attention (TurboDiffusion QAD analog).

Behavioral reference: /root/reference/fastvideo/attention/backends/
attn_qat_train.py (:61-113) + fastvideo-kernel/triton_kernels/
attn_qat_train.py: attention computed through FAKE-QUANTIZED q/k (and
optionally the softmax probabilities and v) with per-block scales, and
straight-through gradients so the checkpoint learns to live inside the
quantization grid it will be served with.

TPU mapping: fake-quant (quantize -> dequantize, STE backward via
``jax.custom_vjp``) at int8 per-(64-token-block, head) granularity — the
MXU's low-precision grid — then standard differentiable attention math in
bf16. The reference defaults (is_qat=True, fake_quant_p_bwd=True,
use_high_prec_o=True, per-block not global scales) map to quantizing q,
k, and p while keeping o in high precision.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

QAT_BLOCK = 64


@jax.custom_vjp
def fake_quant_int8(x: Array, scale: Array) -> Array:
    """round(x / scale).clip(-127,127) * scale with identity gradient."""
    q = jnp.clip(jnp.round(x / scale), -127, 127)
    return q * scale


def _fq_fwd(x, scale):
    return fake_quant_int8(x, scale), None


def _fq_bwd(_, g):
    # straight-through: gradient flows as if quantization were identity
    return g, None


fake_quant_int8.defvjp(_fq_fwd, _fq_bwd)


def _block_scales(x: Array, block: int) -> Array:
    """Per-(seq-block, head) amax/127 scales for [B, S, H, D] tensors."""
    b, s, h, d = x.shape
    xb = jax.lax.stop_gradient(x).reshape(b, s // block, block, h, d)
    amax = jnp.max(jnp.abs(xb.astype(jnp.float32)), axis=(2, 4),
                   keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    return jnp.broadcast_to(scale, xb.shape).reshape(x.shape)


def fake_quant_blockwise(x: Array, block: int = QAT_BLOCK) -> Array:
    return fake_quant_int8(x.astype(jnp.float32),
                           _block_scales(x, block)).astype(x.dtype)


def qat_attention(q: Array, k: Array, v: Array, *,
                  scale: float | None = None,
                  quant_p: bool = True,
                  smooth_k: bool = False,
                  block: int = QAT_BLOCK) -> Array:
    """Differentiable fake-quantized attention on [B, S, H, D].

    Pads the sequence to the quant block internally; gradients flow to
    q/k/v through the straight-through estimator.
    """
    b, s, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    # smooth the UNPADDED keys: a mean over zero-pad rows would
    # under-center k by s/(s+pad) vs the serving-time quantization
    if smooth_k:
        k = k - jnp.mean(k, axis=1, keepdims=True)
    pad = (-s) % block
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    qq = fake_quant_blockwise(q, block)
    kq = fake_quant_blockwise(k, block)

    logits = jnp.einsum("bshd,bthd->bhst", qq.astype(jnp.float32),
                        kq.astype(jnp.float32)) * scale
    if pad:
        key_mask = jnp.arange(s + pad) < s
        logits = jnp.where(key_mask[None, None, None], logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    if quant_p:
        # per-(query-block, head) scales over the prob rows (analog of the
        # reference's fake_quant_p path; probs are >= 0 so amax/127 keeps
        # the int8 grid dense near the mass)
        bp, hp, sq, st = p.shape
        pb = jax.lax.stop_gradient(p).reshape(bp, hp, sq // block, block,
                                              st)
        amax = jnp.maximum(
            jnp.max(pb, axis=(3, 4), keepdims=True) / 127.0, 1e-8)
        pscale = jnp.broadcast_to(amax, pb.shape).reshape(p.shape)
        p = fake_quant_int8(p, pscale)
    out = jnp.einsum("bhst,bthd->bshd", p, v.astype(jnp.float32))
    if pad:
        out = out[:, :s]
    return out.astype(q.dtype)
