"""LingBot-Video DiT (Dense / MoE joint video-text transformer).

Behavioral reference: /root/reference/fastvideo/models/dits/
lingbot_video.py (:61-808): a single joint [video | text] stream with
complex 3-axis rotary positions (text occupies temporal slots 1..L,
video starts at L+1), per-token 6-way AdaLN with tanh gates and
post-attention/post-ffn RMS norms, and a token-choice sparse-MoE
feed-forward (fp32 router with a persistent e-score correction bias,
optional group-limited top-k, optional shared experts).

TPU shape: expert dispatch is a per-token gather of the chosen experts'
weights followed by batched einsums — exact (same numerics as the
reference's grouped matmuls) and fully static. Uniform-length text
(all-ones attention mask) is assumed, matching this framework's padded
batches; the reference's per-sample ragged rope reduces to one table.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention import LocalAttention
from fastvideo_tpu.layers.embeddings import timestep_embedding
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import FP32LayerNorm, RMSNorm

Array = jax.Array


@functools.lru_cache(maxsize=32)
def _lingbot_rope(text_len: int, grid: tuple[int, int, int],
                  axes_dims: tuple[int, ...],
                  theta: float) -> tuple[np.ndarray, np.ndarray]:
    """Joint [video; text] interleaved rope tables (reference :95-157)."""
    gt, gh, gw = grid
    t_pos = np.arange(gt) + text_len + 1
    vid = np.stack(np.meshgrid(t_pos, np.arange(gh), np.arange(gw),
                               indexing="ij"), -1).reshape(-1, 3)
    txt_t = np.arange(text_len) + 1
    txt = np.stack([txt_t, np.zeros_like(txt_t), np.zeros_like(txt_t)], -1)
    pos = np.concatenate([vid, txt], axis=0)
    cos_parts, sin_parts = [], []
    for i, dim in enumerate(axes_dims):
        freqs = 1.0 / (theta**(np.arange(0, dim, 2, dtype=np.float64) / dim))
        ang = np.outer(pos[:, i].astype(np.float64), freqs)
        cos_parts.append(np.repeat(np.cos(ang), 2, axis=-1))
        sin_parts.append(np.repeat(np.sin(ang), 2, axis=-1))
    return (np.concatenate(cos_parts, -1).astype(np.float32),
            np.concatenate(sin_parts, -1).astype(np.float32))


def _apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    xf = x.astype(jnp.float32)
    pairs = xf.reshape(*xf.shape[:-1], -1, 2)
    rot = jnp.stack([-pairs[..., 1], pairs[..., 0]], -1).reshape(xf.shape)
    return (xf * cos[None, :, None] + rot * sin[None, :, None]).astype(
        x.dtype)


class LingBotVideoAttention(nnx.Module):
    """(reference :175-230)."""

    def __init__(self, hidden_size: int, num_heads: int, norm_eps: float,
                 qkv_bias: bool, out_bias: bool, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.to_q = Linear(hidden_size, hidden_size, bias=qkv_bias, **kw)
        self.to_k = Linear(hidden_size, hidden_size, bias=qkv_bias, **kw)
        self.to_v = Linear(hidden_size, hidden_size, bias=qkv_bias, **kw)
        self.norm_q = RMSNorm(self.head_dim, eps=norm_eps, **kw)
        self.norm_k = RMSNorm(self.head_dim, eps=norm_eps, **kw)
        self.to_out = Linear(hidden_size, hidden_size, bias=out_bias, **kw)
        self.attn = LocalAttention(num_heads, self.head_dim)

    def __call__(self, x: Array, rope: tuple[Array, Array]) -> Array:
        b, s, _ = x.shape
        q = self.to_q(x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(x).reshape(b, s, self.num_heads, self.head_dim)
        v = self.to_v(x).reshape(b, s, self.num_heads, self.head_dim)
        cos, sin = rope
        q = _apply_rope(self.norm_q(q).astype(x.dtype), cos, sin)
        k = _apply_rope(self.norm_k(k).astype(x.dtype), cos, sin)
        out = self.attn(q, k, v)
        return self.to_out(out.reshape(b, s, -1).astype(x.dtype))


class LingBotVideoMLP(nnx.Module):
    def __init__(self, hidden_size: int, intermediate_size: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.gate_proj = Linear(hidden_size, intermediate_size, bias=False,
                                **kw)
        self.up_proj = Linear(hidden_size, intermediate_size, bias=False,
                              **kw)
        self.down_proj = Linear(intermediate_size, hidden_size, bias=False,
                                **kw)

    def __call__(self, x: Array) -> Array:
        return self.down_proj(jax.nn.silu(self.gate_proj(x)) *
                              self.up_proj(x))


class LingBotVideoRouter(nnx.Module):
    """fp32 token-choice router (reference :247-302)."""

    def __init__(self, hidden_size: int, num_experts: int, top_k: int,
                 score_func: str, norm_topk_prob: bool, n_group, topk_group,
                 route_scale: float, *, param_dtype, rngs: nnx.Rngs):
        del param_dtype
        init = nnx.initializers.lecun_normal()
        self.weight = nnx.Param(
            init(rngs.params(), (num_experts, hidden_size), jnp.float32))
        self.e_score_correction_bias = nnx.Param(
            jnp.zeros((num_experts,), jnp.float32))
        self.num_experts = num_experts
        self.top_k = top_k
        self.score_func = score_func
        self.norm_topk_prob = norm_topk_prob
        self.n_group = n_group
        self.topk_group = topk_group
        self.route_scale = route_scale

    def __call__(self, tokens: Array):
        logits = tokens.astype(jnp.float32) @ self.weight.value.T
        scores = (jax.nn.softmax(logits, -1)
                  if self.score_func == "softmax" else
                  jax.nn.sigmoid(logits))
        choice = scores + self.e_score_correction_bias.value[None]
        if self.n_group is not None and self.n_group > 1:
            t = choice.shape[0]
            epg = self.num_experts // self.n_group
            grouped = choice.reshape(t, self.n_group, epg)
            group_scores = jax.lax.top_k(grouped, 2)[0].sum(-1)
            _, gidx = jax.lax.top_k(group_scores, self.topk_group)
            gmask = jax.nn.one_hot(gidx, self.n_group).sum(1) > 0
            mask = jnp.repeat(gmask, epg, axis=-1)
            choice = jnp.where(mask, choice, -jnp.inf)
        _, top_idx = jax.lax.top_k(choice, self.top_k)
        top_scores = jnp.take_along_axis(scores, top_idx, axis=-1)
        if self.top_k > 1 and self.norm_topk_prob:
            top_scores = top_scores / (top_scores.sum(-1, keepdims=True) +
                                       1e-20)
        return top_idx, (top_scores * self.route_scale).astype(tokens.dtype)


class LingBotVideoGroupedExperts(nnx.Module):
    """w1/w3 [E, I, H], w2 [E, H, I] (reference :305-313)."""

    def __init__(self, num_experts: int, hidden_size: int,
                 intermediate_size: int, *, param_dtype, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.w1 = nnx.Param(
            init(rngs.params(), (num_experts, intermediate_size,
                                 hidden_size), param_dtype))
        self.w2 = nnx.Param(
            init(rngs.params(), (num_experts, hidden_size,
                                 intermediate_size), param_dtype))
        self.w3 = nnx.Param(
            init(rngs.params(), (num_experts, intermediate_size,
                                 hidden_size), param_dtype))


class LingBotVideoSparseMoeBlock(nnx.Module):
    """(reference :321-512); per-token weight gather + batched einsums."""

    def __init__(self, hidden_size: int, num_experts: int, top_k: int,
                 moe_intermediate_size: int, score_func: str,
                 norm_topk_prob: bool, n_group, topk_group,
                 routed_scaling_factor: float, n_shared_experts, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.hidden_size = hidden_size
        self.router = LingBotVideoRouter(hidden_size, num_experts, top_k,
                                         score_func, norm_topk_prob,
                                         n_group, topk_group,
                                         routed_scaling_factor, **kw)
        self.experts = LingBotVideoGroupedExperts(num_experts, hidden_size,
                                                  moe_intermediate_size,
                                                  **kw)
        self.shared_experts = (LingBotVideoMLP(
            hidden_size, moe_intermediate_size * n_shared_experts, **kw)
                               if n_shared_experts else None)

    def __call__(self, x: Array,
                 padding_mask: Array | None = None) -> Array:
        b, s, _ = x.shape
        tokens = x.reshape(-1, self.hidden_size)
        top_idx, top_scores = self.router(tokens)
        if padding_mask is not None:
            mask = padding_mask.reshape(-1, 1).astype(top_scores.dtype)
            top_scores = top_scores * mask
            top_scores = top_scores / (top_scores.sum(-1, keepdims=True) +
                                       1e-9)
            top_scores = top_scores * self.router.route_scale
        dtype = x.dtype
        w1 = jnp.take(self.experts.w1.value, top_idx, axis=0).astype(dtype)
        w2 = jnp.take(self.experts.w2.value, top_idx, axis=0).astype(dtype)
        w3 = jnp.take(self.experts.w3.value, top_idx, axis=0).astype(dtype)
        h = jax.nn.silu(jnp.einsum("tkih,th->tki", w1, tokens)) * \
            jnp.einsum("tkih,th->tki", w3, tokens)
        out_k = jnp.einsum("tkhi,tki->tkh", w2, h)
        out = (out_k.astype(jnp.float32) *
               top_scores.astype(jnp.float32)[..., None]).sum(1)
        out = out.astype(dtype).reshape(b, s, -1)
        if self.shared_experts is not None:
            out = out + self.shared_experts(x)
        return out


class LingBotVideoBlock(nnx.Module):
    """(reference :515-594)."""

    def __init__(self, arch, layer_idx: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        hidden = arch.hidden_size
        self.scale_shift_table = nnx.Param(
            jnp.zeros((1, 6 * hidden), jnp.float32))
        self.norm1 = RMSNorm(hidden, eps=arch.norm_eps, **kw)
        self.attn = LingBotVideoAttention(hidden, arch.num_attention_heads,
                                          arch.norm_eps, arch.qkv_bias,
                                          arch.out_bias, **kw)
        self.norm_post_attn = RMSNorm(hidden, eps=arch.norm_eps, **kw)
        self.norm2 = RMSNorm(hidden, eps=arch.norm_eps, **kw)
        is_moe = (layer_idx not in tuple(arch.mlp_only_layers)
                  and arch.num_experts > 0
                  and (layer_idx + 1) % arch.decoder_sparse_step == 0)
        if is_moe:
            self.ffn = LingBotVideoSparseMoeBlock(
                hidden, arch.num_experts, arch.num_experts_per_tok,
                arch.moe_intermediate_size, arch.score_func,
                arch.norm_topk_prob, arch.n_group, arch.topk_group,
                arch.routed_scaling_factor, arch.n_shared_experts, **kw)
        else:
            self.ffn = LingBotVideoMLP(hidden, arch.intermediate_size, **kw)
        self.norm_post_ffn = RMSNorm(hidden, eps=arch.norm_eps, **kw)
        self.is_moe = is_moe

    def __call__(self, x: Array, temb6: Array, rope,
                 moe_padding_mask=None) -> Array:
        b, s, _ = x.shape
        mod = temb6.reshape(b, s, -1) + \
            self.scale_shift_table.value[None].astype(jnp.float32)
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
         gate_mlp) = jnp.split(mod, 6, axis=-1)
        gate_msa = jnp.tanh(gate_msa)
        gate_mlp = jnp.tanh(gate_mlp)
        dtype = x.dtype

        attn_in = (self.norm1(x).astype(jnp.float32) * (1.0 + scale_msa) +
                   shift_msa).astype(dtype)
        attn_out = self.attn(attn_in, rope)
        x = x + (gate_msa * self.norm_post_attn(attn_out).astype(
            jnp.float32)).astype(dtype)
        mlp_in = (self.norm2(x).astype(jnp.float32) * (1.0 + scale_mlp) +
                  shift_mlp).astype(dtype)
        if self.is_moe:
            mlp_out = self.ffn(mlp_in, padding_mask=moe_padding_mask)
        else:
            mlp_out = self.ffn(mlp_in)
        mlp_out = self.norm_post_ffn(mlp_out).astype(jnp.float32)
        return x + (gate_mlp * mlp_out).astype(dtype)


class LingBotVideoTransformer3DModel(nnx.Module):
    """(reference :610-808)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        arch = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        hidden = arch.hidden_size
        self.patch_embedder = Linear(
            arch.in_channels * math.prod(arch.patch_size), hidden,
            bias=arch.patch_embed_bias, **kw)
        self.time_embedder = _TimestepMLP(arch.freq_dim, hidden,
                                          arch.timestep_mlp_bias, **kw)
        self.freq_dim = arch.freq_dim
        self.time_modulation = Linear(hidden, 6 * hidden, **kw)
        self.text_embedder = _TextEmbedder(arch.text_dim, hidden, **kw)
        self.blocks = nnx.List([
            LingBotVideoBlock(arch, i, **kw) for i in range(arch.depth)
        ])
        self.norm_out = FP32LayerNorm(hidden, arch.norm_eps, False, **kw)
        self.norm_out_modulation = Linear(hidden, 2 * hidden, **kw)
        self.proj_out = Linear(hidden,
                               math.prod(arch.patch_size) *
                               arch.out_channels, **kw)

    def __call__(self, hidden_states: Array, timestep: Array,
                 encoder_hidden_states, **kwargs) -> Array:
        arch = self.config
        if isinstance(encoder_hidden_states, (list, tuple)):
            encoder_hidden_states = encoder_hidden_states[0]
        b, c, f, h, w = hidden_states.shape
        pt, ph, pw = arch.patch_size
        gt, gh, gw = f // pt, h // ph, w // pw
        video_tokens = gt * gh * gw
        text_tokens = encoder_hidden_states.shape[1]

        x = hidden_states.reshape(b, c, gt, pt, gh, ph, gw, pw)
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1).reshape(b, video_tokens, -1)
        video_hidden = self.patch_embedder(
            x.astype(self.patch_embedder.kernel.value.dtype))
        text_hidden = self.text_embedder(
            encoder_hidden_states.astype(video_hidden.dtype))
        joint = jnp.concatenate([video_hidden, text_hidden], axis=1)

        cos, sin = _lingbot_rope(text_tokens, (gt, gh, gw),
                                 tuple(arch.axes_dims), arch.rope_theta)
        rope = (jnp.asarray(cos), jnp.asarray(sin))

        t_proj = timestep_embedding(timestep.astype(jnp.float32).reshape(-1),
                                    self.freq_dim)
        t_emb = self.time_embedder(t_proj.astype(video_hidden.dtype))
        token_emb = jnp.broadcast_to(t_emb[:, None],
                                     (b, joint.shape[1], t_emb.shape[-1]))
        temb6 = self.time_modulation(
            jax.nn.silu(token_emb)).astype(jnp.float32)

        for block in self.blocks:
            joint = block(joint, temb6, rope)

        final_mod = self.norm_out_modulation(jax.nn.silu(token_emb))
        shift, scale = jnp.split(final_mod.astype(jnp.float32), 2, axis=-1)
        final = self.norm_out(joint).astype(jnp.float32) * (1.0 + scale) + \
            shift
        out = self.proj_out(final.astype(joint.dtype))[:, :video_tokens]
        out = out.reshape(b, gt, gh, gw, pt, ph, pw, arch.out_channels)
        out = out.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(
            b, arch.out_channels, f, h, w)
        return out


class _TimestepMLP(nnx.Module):
    def __init__(self, input_dim: int, hidden_size: int, bias: bool, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.linear_1 = Linear(input_dim, hidden_size, bias=bias, **kw)
        self.linear_2 = Linear(hidden_size, hidden_size, bias=bias, **kw)

    def __call__(self, x: Array) -> Array:
        return self.linear_2(jax.nn.silu(self.linear_1(x)))


class _TextEmbedder(nnx.Module):
    def __init__(self, text_dim: int, hidden_size: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm = RMSNorm(text_dim, eps=1e-6, **kw)
        self.linear_1 = Linear(text_dim, hidden_size, **kw)
        self.linear_2 = Linear(hidden_size, hidden_size, **kw)

    def __call__(self, x: Array) -> Array:
        return self.linear_2(jax.nn.silu(
            self.linear_1(self.norm(x).astype(x.dtype))))


EntryClass = LingBotVideoTransformer3DModel
