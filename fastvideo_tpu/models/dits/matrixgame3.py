"""Matrix-Game 3 DiT: Wan-style trunk + mouse/keyboard action attention.

Behavioral reference: /root/reference/fastvideo/models/dits/matrixgame3/
(model.py:37-797 + action_module.py:30-515): per-frame-indexable complex
3D rope (optionally per-head theta jitter via ``sigma_theta``), image
cross-attention (CLIP tokens), an action module that windows raw
mouse/keyboard streams over the VAE time compression and attends
per-spatial-location over time, an optional memory path (autoregressive
context frames with distinct rope frame indices and camera Plücker
modulation), and the Wan output head.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention import DistributedAttention, LocalAttention
from fastvideo_tpu.layers.embeddings import (ModulateProjection, PatchEmbed3D,
                                             TimestepEmbedder)
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import (FP32LayerNorm, LayerNormScaleShift,
                                       RMSNorm, ScaleResidual)
from fastvideo_tpu.layers.rotary import (apply_rotary_emb,
                                         get_nd_rotary_pos_embed)

Array = jax.Array


@functools.lru_cache(maxsize=8)
def build_rope_freqs(max_seq_len: int, head_dim: int, num_heads: int,
                     sigma_theta: float = 0.0):
    """(reference model.py:37-84): per-axis complex tables as (cos, sin)
    numpy pairs; with sigma_theta > 0 the theta is per-head jittered and
    the tables gain a leading head axis."""
    c = head_dim // 2
    c_t = c - 2 * (c // 3)
    c_h = c // 3
    c_w = c // 3

    def axis(c_part, theta):
        exp = np.arange(c_part, dtype=np.float64) / c_part
        omega = 1.0 / np.power(theta, exp)  # theta scalar or [H,1]
        pos = np.arange(max_seq_len, dtype=np.float64)
        if np.ndim(theta) > 0:
            ang = pos[None, :, None] * omega[:, None, :]
        else:
            ang = pos[:, None] * omega[None, :]
        return np.cos(ang), np.sin(ang)

    if sigma_theta > 0:
        eps = np.linspace(-1, 1, num_heads, dtype=np.float64)
        theta_hat = (10000.0 * (1 + sigma_theta * eps))[:, None]
        parts = [axis(c_t, theta_hat), axis(c_h, theta_hat),
                 axis(c_w, theta_hat)]
        cos = np.concatenate([p[0] for p in parts], axis=2)
        sin = np.concatenate([p[1] for p in parts], axis=2)
    else:
        parts = [axis(c_t, 10000.0), axis(c_h, 10000.0), axis(c_w, 10000.0)]
        cos = np.concatenate([p[0] for p in parts], axis=1)
        sin = np.concatenate([p[1] for p in parts], axis=1)
    return cos.astype(np.float32), sin.astype(np.float32)


def apply_rope_with_frame_indices(x: Array, freqs, *, height: int,
                                  width: int,
                                  frame_indices: tuple[int, ...]) -> Array:
    """x [B, S, H, D] interleaved-pair rotation with per-frame temporal
    indices (reference model.py:88-137)."""
    cos_t, sin_t = freqs
    num_heads = x.shape[2]
    half = x.shape[-1] // 2
    c_t = half - 2 * (half // 3)
    c_h = half // 3
    c_w = half // 3
    idx = np.asarray(frame_indices, np.int64)
    f = len(idx)

    def gather(tbl):
        if tbl.ndim == 3:  # [H, S, C] per-head
            t_part = tbl[:, idx, :c_t]
            h_part = tbl[:, :height, c_t:c_t + c_h]
            w_part = tbl[:, :width, c_t + c_h:c_t + c_h + c_w]
            out = np.concatenate([
                np.broadcast_to(
                    t_part.transpose(1, 0, 2)[:, None, None],
                    (f, height, width, num_heads, c_t)),
                np.broadcast_to(
                    h_part.transpose(1, 0, 2)[None, :, None],
                    (f, height, width, num_heads, c_h)),
                np.broadcast_to(
                    w_part.transpose(1, 0, 2)[None, None],
                    (f, height, width, num_heads, c_w)),
            ], -1).reshape(f * height * width, num_heads, half)
        else:
            t_part = tbl[idx, :c_t]
            h_part = tbl[:height, c_t:c_t + c_h]
            w_part = tbl[:width, c_t + c_h:c_t + c_h + c_w]
            out = np.concatenate([
                np.broadcast_to(t_part[:, None, None],
                                (f, height, width, c_t)),
                np.broadcast_to(h_part[None, :, None],
                                (f, height, width, c_h)),
                np.broadcast_to(w_part[None, None], (f, height, width, c_w)),
            ], -1).reshape(f * height * width, 1, half)
        return np.repeat(out, 2, axis=-1)  # interleaved pair tables [S,H,D]

    cos = jnp.asarray(gather(cos_t))
    sin = jnp.asarray(gather(sin_t))
    xf = x.astype(jnp.float32)
    pairs = xf.reshape(*xf.shape[:-1], -1, 2)
    rot = jnp.stack([-pairs[..., 1], pairs[..., 0]], -1).reshape(xf.shape)
    return (xf * cos[None] + rot * sin[None]).astype(x.dtype)


@functools.lru_cache(maxsize=8)
def _action_rope(rope_dims: tuple[int, ...], max_t: int,
                 theta: float) -> tuple[np.ndarray, np.ndarray]:
    """Temporal-only interleaved rope for action attention
    (action_module.py:223-283): grid (max_t, 1, 1); float32 tables
    matching the reference's dtype=torch.float32 path."""
    cos, sin = get_nd_rotary_pos_embed(rope_dims, (max_t, 1, 1), theta,
                                       use_f64=False)
    return cos, sin


class _ActionRMSNorm(nnx.Module):
    """Bug-compatible WanRMSNorm (action_module.py:18-28): the weight
    parameter exists in the checkpoint but the forward never applies it;
    eps = 1e-5."""

    def __init__(self, dim: int, *, param_dtype=jnp.float32, rngs=None):
        del rngs
        self.weight = nnx.Param(jnp.ones((dim,), param_dtype))

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        return (xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, -1, keepdims=True) + 1e-5)).astype(x.dtype)


class MatrixGame3ActionModule(nnx.Module):
    """(reference action_module.py:65-515)."""

    def __init__(self, mouse_dim_in: int = 2, keyboard_dim_in: int = 6,
                 hidden_size: int = 128, img_hidden_size: int = 1536,
                 keyboard_hidden_dim: int = 1024,
                 mouse_hidden_dim: int = 1024,
                 vae_time_compression_ratio: int = 4, windows_size: int = 3,
                 heads_num: int = 16, patch_size=None, qk_norm: bool = True,
                 qkv_bias: bool = False, rope_dim_list=None,
                 rope_theta: float = 256, mouse_qk_dim_list=None,
                 enable_mouse: bool = True, enable_keyboard: bool = True,
                 blocks=None, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        del blocks
        self.patch_size = tuple(patch_size or (1, 2, 2))
        self.mouse_qk_dim_list = tuple(mouse_qk_dim_list or (8, 28, 28))
        self.rope_theta = rope_theta
        self.enable_mouse = enable_mouse
        self.enable_keyboard = enable_keyboard
        self.vae_time_compression_ratio = vae_time_compression_ratio
        self.windows_size = windows_size
        self.heads_num = heads_num

        if enable_keyboard:
            self.keyboard_embed_1 = Linear(keyboard_dim_in, hidden_size,
                                           **kw)
            self.keyboard_embed_2 = Linear(hidden_size, hidden_size, **kw)
        if enable_mouse:
            c = mouse_hidden_dim
            pad_t = vae_time_compression_ratio * windows_size
            self.mouse_mlp_1 = Linear(mouse_dim_in * pad_t + img_hidden_size,
                                      c, **kw)
            self.mouse_mlp_2 = Linear(c, c, **kw)
            self.mouse_mlp_norm = FP32LayerNorm(c, 1e-5, True, **kw)
            head_dim = c // heads_num
            self.t_qkv = Linear(c, c * 3, bias=qkv_bias, **kw)
            self.img_attn_q_norm = _ActionRMSNorm(head_dim, **kw) \
                if qk_norm else None
            self.img_attn_k_norm = _ActionRMSNorm(head_dim, **kw) \
                if qk_norm else None
            self.proj_mouse = Linear(c, img_hidden_size, bias=qkv_bias, **kw)
            self.mouse_attn_layer = LocalAttention(heads_num, head_dim)
        if enable_keyboard:
            hk = keyboard_hidden_dim // heads_num
            self.key_attn_q_norm = _ActionRMSNorm(hk, **kw) \
                if qk_norm else None
            self.key_attn_k_norm = _ActionRMSNorm(hk, **kw) \
                if qk_norm else None
            self.mouse_attn_q = Linear(img_hidden_size, keyboard_hidden_dim,
                                       bias=qkv_bias, **kw)
            self.keyboard_attn_kv = Linear(
                hidden_size * windows_size * vae_time_compression_ratio,
                keyboard_hidden_dim * 2, bias=qkv_bias, **kw)
            self.proj_keyboard = Linear(keyboard_hidden_dim,
                                        img_hidden_size, bias=qkv_bias,
                                        **kw)
            self.keyboard_attn_layer = LocalAttention(heads_num, hk)

    def _keyboard_embed(self, x: Array) -> Array:
        return self.keyboard_embed_2(
            jax.nn.silu(self.keyboard_embed_1(x)))

    def _rope(self, q: Array, k: Array, mem_len: int):
        cos, sin = _action_rope(self.mouse_qk_dim_list, 256,
                                float(self.rope_theta))
        cos_j, sin_j = jnp.asarray(cos), jnp.asarray(sin)

        def ap(x):
            return apply_rotary_emb(x, cos_j[:x.shape[1]],
                                    sin_j[:x.shape[1]])

        if mem_len > 0:
            q = jnp.concatenate([ap(q[:, :mem_len]), ap(q[:, mem_len:])], 1)
            k = jnp.concatenate([ap(k[:, :mem_len]), ap(k[:, mem_len:])], 1)
            return q, k
        return ap(q), ap(k)

    def _windows(self, cond: Array, n_feats: int) -> Array:
        """[B, frames, C] -> [B, n_feats, pad_t, C] sliding windows."""
        r, ws = self.vae_time_compression_ratio, self.windows_size
        pad_t = r * ws
        pad = jnp.broadcast_to(cond[:, 0:1],
                               (cond.shape[0], pad_t, cond.shape[-1]))
        cond = jnp.concatenate([pad, cond], axis=1)
        groups = [cond[:, r * (i - ws) + pad_t:i * r + pad_t]
                  for i in range(n_feats)]
        return jnp.stack(groups, axis=1)

    def __call__(self, x: Array, tt: int, th: int, tw: int,
                 mouse_condition: Array | None = None,
                 keyboard_condition: Array | None = None,
                 mouse_cond_memory: Array | None = None,
                 keyboard_cond_memory: Array | None = None) -> Array:
        if keyboard_condition is None:
            return x
        b, n_frames, _ = keyboard_condition.shape
        r = self.vae_time_compression_ratio
        if ((n_frames - 1) + r) % r == 0:
            n_feats = (n_frames - 1) // r + 1
        else:
            n_feats = n_frames // r
        s = th * tw
        pad_t = r * self.windows_size
        dtype = x.dtype

        if self.enable_mouse and mouse_condition is not None:
            mouse_condition = mouse_condition.astype(dtype)
            hs = x.reshape(b, tt, s, -1).transpose(0, 2, 1, 3).reshape(
                b * s, tt, -1)
            grp = self._windows(mouse_condition, n_feats)
            mem_len = 0
            if mouse_cond_memory is not None:
                mem_len = mouse_cond_memory.shape[1]
                mem = jnp.broadcast_to(
                    mouse_cond_memory.astype(dtype)[:, :, None],
                    (b, mem_len, pad_t, mouse_cond_memory.shape[-1]))
                grp = jnp.concatenate([mem, grp], axis=1)
            f_act = grp.shape[1]
            c_m = grp.shape[-1]
            grp = jnp.broadcast_to(grp[..., None],
                                   (b, f_act, pad_t, c_m, s))
            grp = grp.transpose(0, 4, 1, 2, 3).reshape(
                b * s, f_act, pad_t * c_m)
            grp = jnp.concatenate([hs, grp], axis=-1)
            grp = self.mouse_mlp_norm(
                self.mouse_mlp_2(
                    jax.nn.gelu(self.mouse_mlp_1(grp)))).astype(dtype)
            qkv = self.t_qkv(grp).reshape(b * s, f_act, 3, self.heads_num,
                                          -1)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if self.img_attn_q_norm is not None:
                q = self.img_attn_q_norm(q).astype(dtype)
                k = self.img_attn_k_norm(k).astype(dtype)
            q, k = self._rope(q, k, mem_len)
            attn = self.mouse_attn_layer(q, k, v)
            attn = attn.reshape(b, s, f_act, -1).transpose(0, 2, 1,
                                                           3).reshape(
                                                               b,
                                                               f_act * s, -1)
            attn = self.proj_mouse(attn)
            x = x + attn if attn.shape[1] == x.shape[1] else \
                x + attn[:, -x.shape[1]:]

        if self.enable_keyboard:
            keyboard_condition = keyboard_condition.astype(dtype)
            kb = self._keyboard_embed(
                jnp.concatenate([
                    jnp.broadcast_to(
                        keyboard_condition[:, 0:1],
                        (b, pad_t, keyboard_condition.shape[-1])),
                    keyboard_condition
                ], axis=1))
            groups = [kb[:, r * (i - self.windows_size) + pad_t:i * r +
                         pad_t] for i in range(n_feats)]
            grp = jnp.stack(groups, axis=1)
            mem_len = 0
            if keyboard_cond_memory is not None:
                mem_len = keyboard_cond_memory.shape[1]
                k_mem = self._keyboard_embed(
                    keyboard_cond_memory.astype(dtype))
                k_mem = jnp.broadcast_to(
                    k_mem[:, :, None], (b, mem_len, pad_t, k_mem.shape[-1]))
                grp = jnp.concatenate([k_mem, grp], axis=1)
            grp = grp.reshape(b, grp.shape[1], -1)

            q = self.mouse_attn_q(x)
            kv = self.keyboard_attn_kv(grp)
            d = q.shape[-1] // self.heads_num
            q = q.reshape(b, -1, self.heads_num, d)
            kv = kv.reshape(b, grp.shape[1], 2, self.heads_num, d)
            k, v = kv[:, :, 0], kv[:, :, 1]
            if self.key_attn_q_norm is not None:
                q = self.key_attn_q_norm(q).astype(dtype)
                k = self.key_attn_k_norm(k).astype(dtype)
            t_ = q.shape[1] // s
            q = q.reshape(b, t_, s, self.heads_num, d).transpose(
                0, 2, 1, 3, 4).reshape(b * s, t_, self.heads_num, d)
            q, k = self._rope(q, k, mem_len)
            k = jnp.repeat(k, s, axis=0)
            v = jnp.repeat(v, s, axis=0)
            attn = self.keyboard_attn_layer(q, k, v)
            attn = attn.reshape(b, s, t_, -1).transpose(0, 2, 1, 3).reshape(
                b, t_ * s, -1)
            attn = self.proj_keyboard(attn)
            x = x + attn
        return x


class MatrixGame3CrossAttention(nnx.Module):
    """Image-token cross-attention (reference model.py:175-196)."""

    def __init__(self, dim: int, num_heads: int,
                 qk_norm: str = "rms_norm_across_heads", eps: float = 1e-6,
                 *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.to_q = Linear(dim, dim, **kw)
        self.to_k = Linear(dim, dim, **kw)
        self.to_v = Linear(dim, dim, **kw)
        self.to_out = Linear(dim, dim, **kw)
        norm_dim = self.head_dim if qk_norm == "rms_norm" else dim
        self.norm_q = RMSNorm(norm_dim, eps=eps, **kw)
        self.norm_k = RMSNorm(norm_dim, eps=eps, **kw)
        self.qk_norm = qk_norm
        self.attn = LocalAttention(num_heads, self.head_dim)

    def __call__(self, x: Array, context: Array) -> Array:
        b = x.shape[0]
        n, d = self.num_heads, self.head_dim
        if self.qk_norm == "rms_norm":
            q = self.norm_q(self.to_q(x).reshape(b, -1, n, d)).astype(
                x.dtype)
            k = self.norm_k(self.to_k(context).reshape(b, -1, n,
                                                       d)).astype(x.dtype)
        else:
            q = self.norm_q(self.to_q(x)).astype(x.dtype).reshape(
                b, -1, n, d)
            k = self.norm_k(self.to_k(context)).astype(x.dtype).reshape(
                b, -1, n, d)
        v = self.to_v(context).reshape(b, -1, n, d)
        return self.to_out(self.attn(q, k, v).reshape(b, -1, n * d))


class MatrixGame3TransformerBlock(nnx.Module):
    """(reference model.py:199-460)."""

    def __init__(self, dim: int, ffn_dim: int, num_heads: int,
                 qk_norm: str = "rms_norm_across_heads", eps: float = 1e-6,
                 action_config: dict | None = None,
                 block_id: int | None = None, use_memory: bool = False, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        action_config = action_config or {}
        self.use_memory = use_memory
        self.num_attention_heads = num_heads
        self.dim = dim
        self.norm1 = FP32LayerNorm(dim, eps, False, **kw)
        self.to_q = Linear(dim, dim, **kw)
        self.to_k = Linear(dim, dim, **kw)
        self.to_v = Linear(dim, dim, **kw)
        self.to_out = Linear(dim, dim, **kw)
        self.attn1 = DistributedAttention(num_heads, dim // num_heads)
        norm_dim = dim // num_heads if qk_norm == "rms_norm" else dim
        self.norm_q = RMSNorm(norm_dim, eps=eps, **kw)
        self.norm_k = RMSNorm(norm_dim, eps=eps, **kw)
        self.qk_norm = qk_norm
        self.self_attn_residual_norm = _AffineLN(dim, eps, True, **kw)
        self.attn2 = MatrixGame3CrossAttention(dim, num_heads, qk_norm, eps,
                                               **kw)
        self.cross_attn_residual_norm = _AffineLN(dim, eps, False, **kw)
        enabled = set(action_config.get("blocks", []))
        self.use_action_module = bool(action_config) and (
            block_id is None or block_id in enabled)
        self.action_model = (MatrixGame3ActionModule(
            **{k: v for k, v in action_config.items()}, **kw)
                             if self.use_action_module else None)
        self.ffn = MLP(dim, ffn_dim, act_type="gelu_pytorch_tanh", **kw)
        self.mlp_residual = ScaleResidual()
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (1, 6, dim), jnp.float32) /
            dim**0.5)
        if use_memory:
            self.cam_injector_layer1 = Linear(dim, dim, **kw)
            self.cam_injector_layer2 = Linear(dim, dim, **kw)
            self.cam_scale_layer = Linear(dim, dim, **kw)
            self.cam_shift_layer = Linear(dim, dim, **kw)

    def __call__(self, x: Array, context: Array, temb: Array, freqs,
                 grid_sizes: tuple[int, int, int],
                 mouse_cond: Array | None = None,
                 keyboard_cond: Array | None = None,
                 mouse_cond_memory: Array | None = None,
                 keyboard_cond_memory: Array | None = None,
                 plucker_emb: Array | None = None, memory_length: int = 0,
                 memory_latent_idx: tuple[int, ...] | None = None,
                 predict_latent_idx: tuple[int, ...] | None = None) -> Array:
        orig_dtype = x.dtype
        b = x.shape[0]
        n, d = self.num_attention_heads, self.dim // self.num_attention_heads
        gt, gh, gw = grid_sizes

        if temb.ndim == 4:
            e = self.scale_shift_table.value[None] + temb.astype(jnp.float32)
            mods = [e[:, :, i] for i in range(6)]
        else:
            e = self.scale_shift_table.value + temb.astype(jnp.float32)
            mods = [e[:, i:i + 1] for i in range(6)]
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = mods

        norm_x = (self.norm1(x).astype(jnp.float32) * (1 + scale_msa) +
                  shift_msa).astype(orig_dtype)
        if self.qk_norm == "rms_norm":
            q = self.norm_q(self.to_q(norm_x).reshape(b, -1, n, d)).astype(
                orig_dtype)
            k = self.norm_k(self.to_k(norm_x).reshape(b, -1, n, d)).astype(
                orig_dtype)
        else:
            q = self.norm_q(self.to_q(norm_x)).astype(orig_dtype).reshape(
                b, -1, n, d)
            k = self.norm_k(self.to_k(norm_x)).astype(orig_dtype).reshape(
                b, -1, n, d)
        v = self.to_v(norm_x).reshape(b, -1, n, d)

        if memory_length > 0:
            hw = gh * gw
            mem_idx = memory_latent_idx or tuple(range(memory_length))
            pred_idx = predict_latent_idx or tuple(
                range(gt - memory_length))
            q = jnp.concatenate([
                apply_rope_with_frame_indices(q[:, :memory_length * hw],
                                              freqs, height=gh, width=gw,
                                              frame_indices=mem_idx),
                apply_rope_with_frame_indices(q[:, memory_length * hw:],
                                              freqs, height=gh, width=gw,
                                              frame_indices=pred_idx)
            ], axis=1)
            k = jnp.concatenate([
                apply_rope_with_frame_indices(k[:, :memory_length * hw],
                                              freqs, height=gh, width=gw,
                                              frame_indices=mem_idx),
                apply_rope_with_frame_indices(k[:, memory_length * hw:],
                                              freqs, height=gh, width=gw,
                                              frame_indices=pred_idx)
            ], axis=1)
        else:
            pred_idx = predict_latent_idx or tuple(range(gt))
            q = apply_rope_with_frame_indices(q, freqs, height=gh, width=gw,
                                              frame_indices=pred_idx)
            k = apply_rope_with_frame_indices(k, freqs, height=gh, width=gw,
                                              frame_indices=pred_idx)

        attn_out = self.attn1(q, k, v)
        attn_out = self.to_out(attn_out.reshape(b, -1, self.dim))

        x = x.astype(jnp.float32) + attn_out.astype(jnp.float32) * gate_msa
        if self.use_memory and plucker_emb is not None:
            pe = plucker_emb.astype(orig_dtype)
            c2ws = self.cam_injector_layer2(
                jax.nn.silu(self.cam_injector_layer1(pe))) + pe
            cam_scale = self.cam_scale_layer(c2ws).astype(jnp.float32)
            cam_shift = self.cam_shift_layer(c2ws).astype(jnp.float32)
            x = (1.0 + cam_scale) * x + cam_shift
        norm_x = self.self_attn_residual_norm(x)

        attn_out = self.attn2(norm_x.astype(orig_dtype), context)
        base = norm_x if (mouse_cond is not None or self.use_memory) else x
        x = base.astype(jnp.float32) + attn_out.astype(jnp.float32)
        norm_x = self.cross_attn_residual_norm(x)
        norm_x = norm_x * (1 + c_scale) + c_shift

        if self.action_model is not None and (mouse_cond is not None or
                                              keyboard_cond is not None):
            x = self.action_model(x.astype(orig_dtype), gt, gh, gw,
                                  mouse_cond, keyboard_cond,
                                  mouse_cond_memory=mouse_cond_memory,
                                  keyboard_cond_memory=keyboard_cond_memory)
            x = x.astype(jnp.float32)
            norm_x = self.cross_attn_residual_norm(x)
            norm_x = norm_x * (1 + c_scale) + c_shift

        ff = self.ffn(norm_x.astype(orig_dtype))
        x = self.mlp_residual(x, ff, c_gate)
        return x.astype(orig_dtype)


class _AffineLN(nnx.Module):
    """fp32 LayerNorm (optionally affine) used bare (reference keeps the
    norm inside ScaleResidualLayerNormScaleShift but calls only .norm)."""

    def __init__(self, dim: int, eps: float, affine: bool, *, param_dtype,
                 rngs: nnx.Rngs):
        self.norm = FP32LayerNorm(dim, eps, affine, param_dtype=param_dtype,
                                  rngs=rngs)

    def __call__(self, x: Array) -> Array:
        return self.norm(x.astype(jnp.float32)).astype(jnp.float32)


class MatrixGame3TimeImageEmbedding(nnx.Module):
    def __init__(self, dim: int, time_freq_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.time_embedder = TimestepEmbedder(
            dim, act_layer="silu", frequency_embedding_size=time_freq_dim,
            **kw)
        self.time_modulation = ModulateProjection(dim, factor=6,
                                                  act_layer="silu", **kw)

    def __call__(self, timestep: Array, timestep_seq_len=None):
        temb = self.time_embedder(timestep, timestep_seq_len)
        return temb, self.time_modulation(temb)


class MatrixGame3WanModel(nnx.Module):
    """(reference model.py:466-797)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        arch = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        inner = arch.num_attention_heads * arch.attention_head_dim
        self.inner_dim = inner
        self.patch_size = tuple(arch.patch_size)
        self.use_memory = getattr(arch, "use_memory", False)
        self.sigma_theta = float(getattr(arch, "sigma_theta", 0.0))
        self.patch_embedding = PatchEmbed3D(arch.in_channels, inner,
                                            self.patch_size, **kw)
        self.condition_embedder = MatrixGame3TimeImageEmbedding(
            inner, arch.freq_dim, **kw)
        self.text_embedding_1 = Linear(arch.text_dim, inner, **kw)
        self.text_embedding_2 = Linear(inner, inner, **kw)
        if self.use_memory:
            cam_in = getattr(arch, "camera_embed_in_channels", 1536)
            self.camera_patch_embedding = PatchEmbed3D(cam_in, inner,
                                                       self.patch_size,
                                                       **kw)
            self.c2ws_hidden_states_layer1 = Linear(inner, inner, **kw)
            self.c2ws_hidden_states_layer2 = Linear(inner, inner, **kw)
        action_config = dict(getattr(arch, "action_config", {}) or {})
        self.blocks = nnx.List([
            MatrixGame3TransformerBlock(
                inner, arch.ffn_dim, arch.num_attention_heads, arch.qk_norm,
                arch.eps, action_config=action_config, block_id=i,
                use_memory=self.use_memory, **kw)
            for i in range(arch.num_layers)
        ])
        self.norm_out = LayerNormScaleShift(inner, norm_type="layer",
                                            eps=arch.eps,
                                            elementwise_affine=False, **kw)
        self.proj_out = Linear(inner,
                               arch.out_channels *
                               math.prod(self.patch_size), **kw)
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (1, 2, inner), jnp.float32) /
            inner**0.5)
        self.out_channels = arch.out_channels

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array, mouse_cond: Array | None = None,
                 keyboard_cond: Array | None = None,
                 x_memory: Array | None = None,
                 timestep_memory: Array | None = None,
                 mouse_cond_memory: Array | None = None,
                 keyboard_cond_memory: Array | None = None,
                 c2ws_plucker_emb: Array | None = None,
                 memory_latent_idx=None, predict_latent_idx=None,
                 **kwargs) -> Array:
        arch = self.config
        if encoder_hidden_states is not None and isinstance(
                encoder_hidden_states, (list, tuple)):
            encoder_hidden_states = encoder_hidden_states[0]

        memory_length = 0
        if x_memory is not None:
            memory_length = x_memory.shape[2]
            hidden_states = jnp.concatenate(
                [x_memory.astype(hidden_states.dtype), hidden_states],
                axis=2)
        b, c, f, h, w = hidden_states.shape
        pt, ph, pw = self.patch_size
        gt, gh, gw = f // pt, h // ph, w // pw

        if isinstance(predict_latent_idx, tuple) and \
                len(predict_latent_idx) == 2 and not isinstance(
                    predict_latent_idx[0], (list, tuple)):
            predict_latent_idx = tuple(
                range(predict_latent_idx[0], predict_latent_idx[1]))
        if predict_latent_idx is not None:
            predict_latent_idx = tuple(int(i) for i in predict_latent_idx)
        if memory_latent_idx is not None:
            memory_latent_idx = tuple(int(i) for i in memory_latent_idx)

        freqs = build_rope_freqs(
            max_seq_len=(2048 if self.use_memory else 1024),
            head_dim=self.inner_dim // arch.num_attention_heads,
            num_heads=arch.num_attention_heads,
            sigma_theta=(self.sigma_theta if self.use_memory else 0.0))

        x = self.patch_embedding(hidden_states)

        plucker_emb = None
        if c2ws_plucker_emb is not None and self.use_memory:
            if memory_length > 0 and \
                    c2ws_plucker_emb.shape[2] == gt - memory_length:
                zeros = jnp.zeros((*c2ws_plucker_emb.shape[:2],
                                   memory_length,
                                   *c2ws_plucker_emb.shape[3:]),
                                  c2ws_plucker_emb.dtype)
                c2ws_plucker_emb = jnp.concatenate([zeros,
                                                    c2ws_plucker_emb],
                                                   axis=2)
            c2ws_plucker_emb = c2ws_plucker_emb[:, :, :gt * pt, :gh * ph,
                                                :gw * pw]
            plucker_emb = self.camera_patch_embedding(
                c2ws_plucker_emb.astype(x.dtype))
            plucker_emb = plucker_emb + self.c2ws_hidden_states_layer2(
                jax.nn.silu(self.c2ws_hidden_states_layer1(plucker_emb)))

        ts = timestep
        if ts.ndim == 0:
            ts = ts[None]
        if ts.ndim == 1:
            # broadcast over the CURRENT tokens only: gt already counts
            # the memory frames, whose timesteps arrive separately via
            # timestep_memory and are concatenated below
            n_cur = gt * gh * gw
            if memory_length > 0 and timestep_memory is not None:
                n_cur -= timestep_memory.shape[1]
            ts = jnp.broadcast_to(ts[:, None], (ts.shape[0], n_cur))
        elif ts.ndim == 2 and ts.shape[1] == f:
            ts = jnp.broadcast_to(ts[:, :, None, None],
                                  (ts.shape[0], f, gh, gw)).reshape(
                                      ts.shape[0], -1)
        if memory_length > 0:
            assert timestep_memory is not None
            ts = jnp.concatenate([timestep_memory.astype(ts.dtype), ts],
                                 axis=1)
        temb, timestep_proj = self.condition_embedder(
            ts.reshape(-1), timestep_seq_len=ts.shape[1])
        if timestep_proj.ndim == 3 and timestep_proj.shape[-1] % 6 == 0:
            timestep_proj = timestep_proj.reshape(
                *timestep_proj.shape[:2], 6, -1)

        if encoder_hidden_states is not None and \
                encoder_hidden_states.shape[-1] == arch.text_dim:
            encoder_hidden_states = self.text_embedding_2(
                jax.nn.gelu(self.text_embedding_1(
                    encoder_hidden_states.astype(x.dtype))))

        for block in self.blocks:
            x = block(x, encoder_hidden_states, timestep_proj, freqs,
                      (gt, gh, gw), mouse_cond=mouse_cond,
                      keyboard_cond=keyboard_cond,
                      mouse_cond_memory=mouse_cond_memory,
                      keyboard_cond_memory=keyboard_cond_memory,
                      plucker_emb=plucker_emb, memory_length=memory_length,
                      memory_latent_idx=memory_latent_idx,
                      predict_latent_idx=predict_latent_idx)

        if temb.ndim == 3:
            e = self.scale_shift_table.value[None] + temb[:, :, None].astype(
                jnp.float32)
            shift, scale = e[:, :, 0], e[:, :, 1]
        else:
            e = self.scale_shift_table.value + temb[:, None].astype(
                jnp.float32)
            shift, scale = e[:, 0:1], e[:, 1:2]
        x = self.norm_out(x, shift, scale)
        x = self.proj_out(x)
        x = x.reshape(b, gt, gh, gw, pt, ph, pw, -1)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(
            b, -1, gt * pt, gh * ph, gw * pw)
        if memory_length > 0:
            x = x[:, :, memory_length:]
        return x


EntryClass = MatrixGame3WanModel
