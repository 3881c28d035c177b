"""Attention layers: SP-aware DistributedAttention and LocalAttention.

Reference: /root/reference/fastvideo/attention/layer.py:38-313. The TPU
version delegates the Ulysses exchange to
``fastvideo_tpu.parallel.ulysses_attention`` (shard_map + lax.all_to_all over
the ``sp`` mesh axis) and applies RoPE BEFORE the exchange: rope is
per-token, so it commutes with the head/seq redistribution — each device
rotates only its local tokens, avoiding the reference's post-a2a rope on the
full gathered sequence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.attention.backends.abstract import AttentionMetadata
from fastvideo_tpu.attention.selector import get_attn_backend
from fastvideo_tpu.forward_context import get_forward_context
from fastvideo_tpu.layers.rotary import apply_rotary_emb
from fastvideo_tpu.parallel import (get_sp_size, get_tp_size,
                                    local_head_parallel_attention,
                                    ulysses_attention)

Array = jax.Array


class LocalAttention(nnx.Module):
    """Attention with no SP exchange (cross-attn / single-device self-attn).

    Reference analog: attention/layer.py:243 (LocalAttention).
    """

    def __init__(self, num_heads: int, head_size: int,
                 softmax_scale: float | None = None, causal: bool = False,
                 supported_backends: tuple[str, ...] | None = None, *,
                 rngs: nnx.Rngs | None = None, **extra):
        del rngs
        self.num_heads = num_heads
        self.head_size = head_size
        self.backend = get_attn_backend(num_heads, head_size,
                                        softmax_scale=softmax_scale,
                                        causal=causal, supported=supported_backends,
                                        **extra)

    def __call__(self, q: Array, k: Array, v: Array, *,
                 kv_valid: int | None = None) -> Array:
        ctx = get_forward_context()
        metadata = ctx.attn_metadata if ctx is not None else None

        def local_attn(q, k, v):
            return self.backend.forward(q, k, v, metadata, kv_valid=kv_valid)

        if get_tp_size() > 1:
            # tp-sharded heads (column-parallel projections): keep the
            # kernel on local head shards via an explicit shard_map.
            return local_head_parallel_attention(local_attn, q, k, v)
        return local_attn(q, k, v)


class DistributedAttention(nnx.Module):
    """Full-sequence self-attention over seq-sharded tokens.

    Reference analog: attention/layer.py:38-165 (DistributedAttention): the
    all-to-all head/seq exchange around the backend kernel. RoPE application
    (interleaved rotate-half, fp32) happens pre-exchange on local tokens.
    """

    def __init__(self, num_heads: int, head_size: int,
                 softmax_scale: float | None = None, causal: bool = False,
                 supported_backends: tuple[str, ...] | None = None, *,
                 rngs: nnx.Rngs | None = None, **extra):
        del rngs
        self.num_heads = num_heads
        self.head_size = head_size
        self.backend = get_attn_backend(num_heads, head_size,
                                        softmax_scale=softmax_scale,
                                        causal=causal, supported=supported_backends,
                                        **extra)

    def __call__(
        self,
        q: Array,
        k: Array,
        v: Array,
        *,
        freqs_cis: tuple[Array, Array] | None = None,
        kv_valid: int | None = None,
        grid: tuple[int, int, int] | None = None,
        gate: Array | None = None,
        pre_tiled: bool = False,
    ) -> Array:
        """q/k/v: [B, S(_local logical), H, D]; returns same layout.

        ``freqs_cis``: (cos, sin) tables covering the full (padded) sequence;
        they are indexed positionally so they must align with the token order
        of q/k. ``grid``/``gate`` feed the sparse video backends (VSA);
        ``pre_tiled`` marks tokens already in tile-major order (permutation
        hoisted to the model's patch-embed/unpatchify).
        """
        if freqs_cis is not None:
            cos, sin = freqs_cis
            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)

        ctx = get_forward_context()
        metadata = ctx.attn_metadata if ctx is not None else None

        extra_kwargs = {}
        if self.backend.needs_grid:
            extra_kwargs["grid"] = grid
        if pre_tiled:
            assert self.backend.supports_pre_tiled, (
                f"{self.backend.name} cannot consume pre-tiled tokens")
            extra_kwargs["pre_tiled"] = True

        def local_attn(q, k, v, g=None):
            if g is not None:
                extra_kwargs["gate"] = g
            out = self.backend.forward(q, k, v, metadata, kv_valid=kv_valid,
                                       **extra_kwargs)
            return self.backend.postprocess_output(out, metadata)

        if get_sp_size() == 1 and get_tp_size() == 1:
            return local_attn(q, k, v, gate)
        return ulysses_attention(local_attn, q, k, v, extra=gate)

    def joint_forward(
        self,
        q: Array,
        k: Array,
        v: Array,
        replicated_q: Array,
        replicated_k: Array,
        replicated_v: Array,
        *,
        freqs_cis: tuple[Array, Array] | None = None,
        kv_valid: int | None = None,
    ) -> tuple[Array, Array]:
        """Joint image+text attention (reference attention/layer.py:136-156).

        Image q/k/v are seq-sharded; the text (replicated_*) tokens are
        replicated across sp. RoPE applies to the image tokens only. Returns
        (image_out seq-sharded, text_out replicated).
        """
        if freqs_cis is not None:
            cos, sin = freqs_cis
            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)
        ctx = get_forward_context()
        metadata = ctx.attn_metadata if ctx is not None else None
        txt_len = replicated_q.shape[1]

        def attend(q_, k_, v_, rq, rk, rv):
            # TEXT-FIRST concat: kv_valid is a valid-PREFIX count, and the
            # sp zero-pad sits at the END of the image tokens — with text
            # first, the prefix [text | real image] is exactly the valid
            # set (image-first would keep the pads and cut off text).
            # Attention is permutation-invariant in its keys, so ordering
            # only affects the output split.
            qq = jnp.concatenate([rq.astype(q_.dtype), q_], axis=1)
            kk = jnp.concatenate([rk.astype(k_.dtype), k_], axis=1)
            vv = jnp.concatenate([rv.astype(v_.dtype), v_], axis=1)
            kvv = None if kv_valid is None else txt_len + kv_valid
            out = self.backend.forward(qq, kk, vv, metadata, kv_valid=kvv)
            return out[:, txt_len:], out[:, :txt_len]

        sp = get_sp_size()
        if sp == 1 and get_tp_size() == 1:
            return attend(q, k, v, replicated_q, replicated_k, replicated_v)

        import jax
        from jax.sharding import PartitionSpec as P

        from fastvideo_tpu.parallel.mesh import (DP_AXIS, SP_AXIS, TP_AXIS,
                                                 get_mesh)

        mesh = get_mesh()

        def inner(q_, k_, v_, rq, rk, rv):
            def a2a_heads(x):
                return jax.lax.all_to_all(x, SP_AXIS, split_axis=2,
                                          concat_axis=1, tiled=True)

            q_, k_, v_ = a2a_heads(q_), a2a_heads(k_), a2a_heads(v_)
            heads_per = rq.shape[2] // sp
            idx = jax.lax.axis_index(SP_AXIS)
            sl = lambda x: jax.lax.dynamic_slice_in_dim(  # noqa: E731
                x, idx * heads_per, heads_per, axis=2)
            img_out, txt_out = attend(q_, k_, v_, sl(rq), sl(rk), sl(rv))
            img_out = jax.lax.all_to_all(img_out, SP_AXIS, split_axis=1,
                                         concat_axis=2, tiled=True)
            txt_out = jax.lax.all_gather(txt_out, SP_AXIS, axis=2,
                                         tiled=True)
            return img_out, txt_out

        img_spec = P(DP_AXIS, SP_AXIS, TP_AXIS)
        txt_spec = P(DP_AXIS, None, TP_AXIS)
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(img_spec, img_spec, img_spec,
                      txt_spec, txt_spec, txt_spec),
            out_specs=(img_spec, txt_spec),
            check_vma=False,
        )(q, k, v, replicated_q, replicated_k, replicated_v)
