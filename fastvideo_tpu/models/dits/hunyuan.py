"""HunyuanVideo MM-DiT (dual-stream + single-stream), TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/hunyuanvideo.py
(:81-830): per-stream modulation/QKV in double blocks with joint
image+text attention (text replicated across sp; DistributedAttention
joint_forward), fused linear1/linear2 single blocks, llama-text token
refiner, pooled-text + timestep (+ guidance) modulation vector, final
AdaLN layer (HF's swapped scale/shift order preserved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.attention import DistributedAttention, LocalAttention
from fastvideo_tpu.configs.models.dits.hunyuan import HunyuanVideoArchConfig
from fastvideo_tpu.layers.activation import get_act_fn
from fastvideo_tpu.layers.embeddings import (ModulateProjection, PatchEmbed3D,
                                             TimestepEmbedder, unpatchify)
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import (FP32LayerNorm, LayerNormScaleShift,
                                       RMSNorm, ScaleResidual,
                                       ScaleResidualLayerNormScaleShift)
from fastvideo_tpu.layers.rotary import get_nd_rotary_pos_embed
from fastvideo_tpu.parallel import shard_seq, unshard_seq

Array = jax.Array


class MMDoubleStreamBlock(nnx.Module):
    """Dual-stream block (reference hunyuanvideo.py:81-281)."""

    def __init__(self, hidden_size: int, num_heads: int, mlp_ratio: float,
                 *, param_dtype: jnp.dtype, rngs: nnx.Rngs):
        self.num_heads = num_heads
        self.hidden_size = hidden_size
        head_dim = hidden_size // num_heads
        mlp_hidden = int(hidden_size * mlp_ratio)
        kw = dict(param_dtype=param_dtype, rngs=rngs)

        self.img_mod = ModulateProjection(hidden_size, factor=6,
                                          act_layer="silu", **kw)
        self.img_attn_norm = LayerNormScaleShift(
            hidden_size, "layer", elementwise_affine=False, **kw)
        self.img_attn_residual_mlp_norm = ScaleResidualLayerNormScaleShift(
            hidden_size, "layer", elementwise_affine=False, **kw)
        self.img_mlp_residual = ScaleResidual()
        self.img_attn_qkv = Linear(hidden_size, hidden_size * 3, **kw)
        self.img_attn_q_norm = RMSNorm(head_dim, eps=1e-6, **kw)
        self.img_attn_k_norm = RMSNorm(head_dim, eps=1e-6, **kw)
        self.img_attn_proj = Linear(hidden_size, hidden_size, **kw)
        self.img_mlp = MLP(hidden_size, mlp_hidden,
                           act_type="gelu_pytorch_tanh", **kw)

        self.txt_mod = ModulateProjection(hidden_size, factor=6,
                                          act_layer="silu", **kw)
        self.txt_attn_norm = LayerNormScaleShift(
            hidden_size, "layer", elementwise_affine=False, **kw)
        self.txt_attn_residual_mlp_norm = ScaleResidualLayerNormScaleShift(
            hidden_size, "layer", elementwise_affine=False, **kw)
        self.txt_mlp_residual = ScaleResidual()
        self.txt_attn_qkv = Linear(hidden_size, hidden_size * 3, **kw)
        self.txt_attn_q_norm = RMSNorm(head_dim, eps=1e-6, **kw)
        self.txt_attn_k_norm = RMSNorm(head_dim, eps=1e-6, **kw)
        self.txt_attn_proj = Linear(hidden_size, hidden_size, **kw)
        self.txt_mlp = MLP(hidden_size, mlp_hidden,
                           act_type="gelu_pytorch_tanh", **kw)

        self.attn = DistributedAttention(num_heads, head_dim)

    def _qkv(self, x, qkv_layer, q_norm, k_norm):
        b, s, _ = x.shape
        qkv = qkv_layer(x).reshape(b, s, 3, self.num_heads, -1)
        q = q_norm(qkv[:, :, 0]).astype(x.dtype)
        k = k_norm(qkv[:, :, 1]).astype(x.dtype)
        return q, k, qkv[:, :, 2]

    def __call__(self, img: Array, txt: Array, vec: Array,
                 freqs_cis: tuple[Array, Array],
                 kv_valid: int | None = None) -> tuple[Array, Array]:
        img_mods = jnp.split(self.img_mod(vec), 6, axis=-1)
        txt_mods = jnp.split(self.txt_mod(vec), 6, axis=-1)
        (i_shift, i_scale, i_gate, i_mshift, i_mscale, i_mgate) = [
            m[:, None] for m in img_mods
        ]
        (t_shift, t_scale, t_gate, t_mshift, t_mscale, t_mgate) = [
            m[:, None] for m in txt_mods
        ]

        img_in = self.img_attn_norm(img, i_shift, i_scale)
        img_q, img_k, img_v = self._qkv(img_in, self.img_attn_qkv,
                                        self.img_attn_q_norm,
                                        self.img_attn_k_norm)
        txt_in = self.txt_attn_norm(txt, t_shift, t_scale)
        txt_q, txt_k, txt_v = self._qkv(txt_in, self.txt_attn_qkv,
                                        self.txt_attn_q_norm,
                                        self.txt_attn_k_norm)

        img_attn, txt_attn = self.attn.joint_forward(
            img_q, img_k, img_v, txt_q, txt_k, txt_v, freqs_cis=freqs_cis,
            kv_valid=kv_valid)
        b = img.shape[0]
        img_attn = self.img_attn_proj(img_attn.reshape(b, img.shape[1], -1))
        img_mlp_in, img_res = self.img_attn_residual_mlp_norm(
            img, img_attn, i_gate, i_mshift, i_mscale)
        img = self.img_mlp_residual(img_res, self.img_mlp(img_mlp_in),
                                    i_mgate)

        txt_attn = self.txt_attn_proj(txt_attn.reshape(b, txt.shape[1], -1))
        txt_mlp_in, txt_res = self.txt_attn_residual_mlp_norm(
            txt, txt_attn, t_gate, t_mshift, t_mscale)
        txt = self.txt_mlp_residual(txt_res, self.txt_mlp(txt_mlp_in),
                                    t_mgate)
        return img, txt


class MMSingleStreamBlock(nnx.Module):
    """Single-stream block w/ fused linear1/linear2 (reference :283-406)."""

    def __init__(self, hidden_size: int, num_heads: int,
                 mlp_ratio: float = 4.0, *, param_dtype: jnp.dtype,
                 rngs: nnx.Rngs):
        self.hidden_size = hidden_size
        self.num_heads = num_heads
        head_dim = hidden_size // num_heads
        self.mlp_hidden = int(hidden_size * mlp_ratio)
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.linear1 = Linear(hidden_size, hidden_size * 3 + self.mlp_hidden,
                              **kw)
        self.linear2 = Linear(hidden_size + self.mlp_hidden, hidden_size,
                              **kw)
        self.q_norm = RMSNorm(head_dim, eps=1e-6, **kw)
        self.k_norm = RMSNorm(head_dim, eps=1e-6, **kw)
        self.input_norm_scale_shift = LayerNormScaleShift(
            hidden_size, "layer", eps=1e-6, elementwise_affine=False, **kw)
        self.output_residual = ScaleResidual()
        self.mlp_act = get_act_fn("gelu_pytorch_tanh")
        self.modulation = ModulateProjection(hidden_size, factor=3,
                                             act_layer="silu", **kw)
        self.attn = DistributedAttention(num_heads, head_dim)

    def __call__(self, x: Array, vec: Array, txt_len: int,
                 freqs_cis: tuple[Array, Array],
                 kv_valid: int | None = None) -> Array:
        mod_shift, mod_scale, mod_gate = jnp.split(self.modulation(vec), 3,
                                                   axis=-1)
        x_mod = self.input_norm_scale_shift(x, mod_shift[:, None],
                                            mod_scale[:, None])
        lin1 = self.linear1(x_mod)
        qkv, mlp = jnp.split(lin1, [3 * self.hidden_size], axis=-1)
        b, s = qkv.shape[:2]
        qkv = qkv.reshape(b, s, 3, self.num_heads, -1)
        q = self.q_norm(qkv[:, :, 0]).astype(x.dtype)
        k = self.k_norm(qkv[:, :, 1]).astype(x.dtype)
        v = qkv[:, :, 2]

        img_q, txt_q = q[:, :-txt_len], q[:, -txt_len:]
        img_k, txt_k = k[:, :-txt_len], k[:, -txt_len:]
        img_v, txt_v = v[:, :-txt_len], v[:, -txt_len:]
        img_o, txt_o = self.attn.joint_forward(img_q, img_k, img_v, txt_q,
                                               txt_k, txt_v,
                                               freqs_cis=freqs_cis,
                                               kv_valid=kv_valid)
        attn_out = jnp.concatenate([img_o, txt_o], axis=1).reshape(b, s, -1)
        combined = jnp.concatenate([attn_out, self.mlp_act(mlp)], axis=-1)
        out = self.linear2(combined)
        return self.output_residual(x, out, mod_gate[:, None])


class IndividualTokenRefinerBlock(nnx.Module):
    """Text token refiner block (reference :698-789)."""

    def __init__(self, hidden_size: int, num_heads: int,
                 mlp_ratio: float = 4.0, *, param_dtype: jnp.dtype,
                 rngs: nnx.Rngs):
        self.num_heads = num_heads
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = FP32LayerNorm(hidden_size, 1e-6, True, **kw)
        self.self_attn_qkv = Linear(hidden_size, hidden_size * 3, **kw)
        self.self_attn_proj = Linear(hidden_size, hidden_size, **kw)
        self.norm2 = FP32LayerNorm(hidden_size, 1e-6, True, **kw)
        self.mlp = MLP(hidden_size, int(hidden_size * mlp_ratio),
                       act_type="silu", **kw)
        self.adaLN_modulation = ModulateProjection(hidden_size, factor=2,
                                                   act_layer="silu", **kw)
        self.attn = LocalAttention(num_heads, hidden_size // num_heads)

    def __call__(self, x: Array, c: Array) -> Array:
        gate_msa, gate_mlp = jnp.split(self.adaLN_modulation(c), 2, axis=-1)
        b, s, _ = x.shape
        qkv = self.self_attn_qkv(self.norm1(x)).reshape(
            b, s, 3, self.num_heads, -1)
        attn = self.attn(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        x = x + self.self_attn_proj(attn.reshape(b, s, -1)) * \
            gate_msa[:, None]
        return x + self.mlp(self.norm2(x)) * gate_mlp[:, None]


class SingleTokenRefiner(nnx.Module):
    """Text refiner (reference :628-696)."""

    def __init__(self, in_channels: int, hidden_size: int, num_heads: int,
                 depth: int = 2, *, param_dtype: jnp.dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.input_embedder = Linear(in_channels, hidden_size, **kw)
        self.t_embedder = TimestepEmbedder(hidden_size, act_layer="silu",
                                           **kw)
        self.c_embedder = MLP(in_channels, hidden_size, hidden_size,
                              act_type="silu", **kw)
        self.refiner_blocks = nnx.List([
            IndividualTokenRefinerBlock(hidden_size, num_heads, **kw)
            for _ in range(depth)
        ])

    def __call__(self, x: Array, t: Array) -> Array:
        c = self.t_embedder(t) + self.c_embedder(jnp.mean(x, axis=1))
        x = self.input_embedder(x)
        for block in self.refiner_blocks:
            x = block(x, c)
        return x


class FinalLayer(nnx.Module):
    """Output AdaLN + projection; HF's swapped (scale, shift) order
    (reference :791-830)."""

    def __init__(self, hidden_size: int, patch_size: tuple[int, int, int],
                 out_channels: int, *, param_dtype: jnp.dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm_final = FP32LayerNorm(hidden_size, 1e-6, False, **kw)
        out_dim = patch_size[0] * patch_size[1] * patch_size[2] * out_channels
        self.linear = Linear(hidden_size, out_dim, **kw)
        self.adaLN_modulation = ModulateProjection(hidden_size, factor=2,
                                                   act_layer="silu", **kw)

    def __call__(self, x: Array, c: Array) -> Array:
        scale, shift = jnp.split(self.adaLN_modulation(c), 2, axis=-1)
        x = self.norm_final(x) * (1.0 + scale[:, None]) + shift[:, None]
        return self.linear(x)


class HunyuanVideoTransformer3DModel(nnx.Module):
    """Top-level Hunyuan DiT (reference :408-626)."""

    def __init__(self, config: HunyuanVideoArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        hidden = config.hidden_size
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.img_in = PatchEmbed3D(config.in_channels, hidden,
                                   config.patch_size_thw, **kw)
        self.txt_in = SingleTokenRefiner(config.text_embed_dim, hidden,
                                         config.num_attention_heads,
                                         config.num_refiner_layers, **kw)
        self.time_in = TimestepEmbedder(hidden, act_layer="silu", **kw)
        self.vector_in = MLP(config.pooled_projection_dim, hidden, hidden,
                             act_type="silu", **kw)
        self.guidance_in = (TimestepEmbedder(hidden, act_layer="silu", **kw)
                            if config.guidance_embeds else None)
        self.double_blocks = nnx.List([
            MMDoubleStreamBlock(hidden, config.num_attention_heads,
                                config.mlp_ratio, **kw)
            for _ in range(config.num_layers)
        ])
        self.single_blocks = nnx.List([
            MMSingleStreamBlock(hidden, config.num_attention_heads,
                                config.mlp_ratio, **kw)
            for _ in range(config.num_single_layers)
        ])
        out_ch = config.out_channels or config.in_channels
        self.out_channels = out_ch
        self.final_layer = FinalLayer(hidden, config.patch_size_thw, out_ch,
                                      **kw)

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array, encoder_hidden_states_image=None,
                 guidance: Array | None = None, **kwargs) -> Array:
        cfg = self.config
        if guidance is None:
            guidance = jnp.full((hidden_states.shape[0],), 6016.0,
                                jnp.float32)
        if isinstance(encoder_hidden_states, (list, tuple)):
            txt, text_states_2 = encoder_hidden_states
        else:
            txt = encoder_hidden_states[:, 1:]
            text_states_2 = encoder_hidden_states[:, 0,
                                                  :cfg.pooled_projection_dim]

        b, c, ot, oh, ow = hidden_states.shape
        pt, ph, pw = cfg.patch_size_thw
        tt, th, tw = ot // pt, oh // ph, ow // pw
        cos, sin = get_nd_rotary_pos_embed(tuple(cfg.rope_axes_dim),
                                           (tt, th, tw), cfg.rope_theta)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)

        vec = self.time_in(timestep)
        vec = vec + self.vector_in(text_states_2.astype(vec.dtype))
        if self.guidance_in is not None:
            vec = vec + self.guidance_in(guidance)

        img = self.img_in(hidden_states)
        img, orig_seq_len = shard_seq(img)
        if img.shape[1] != cos.shape[0]:
            pad = img.shape[1] - cos.shape[0]
            cos = jnp.pad(cos, ((0, pad), (0, 0)), constant_values=1.0)
            sin = jnp.pad(sin, ((0, pad), (0, 0)))
        kv_valid = orig_seq_len if img.shape[1] != orig_seq_len else None
        txt = self.txt_in(txt.astype(img.dtype), timestep)
        txt_len = txt.shape[1]
        freqs_cis = (cos, sin)

        for block in self.double_blocks:
            img, txt = block(img, txt, vec, freqs_cis, kv_valid)
        x = jnp.concatenate([img, txt], axis=1)
        for block in self.single_blocks:
            x = block(x, vec, txt_len, freqs_cis, kv_valid)
        img = x[:, :-txt_len]
        img = unshard_seq(img, orig_seq_len)
        img = self.final_layer(img, vec)
        return unpatchify(img, tt, th, tw, cfg.patch_size_thw,
                          self.out_channels, feature_order="c_pthw")


EntryClass = HunyuanVideoTransformer3DModel
