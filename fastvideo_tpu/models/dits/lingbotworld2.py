"""LingBot-World 2 causal-fast DiT (14B, streaming chunks).

Behavioral reference: /root/reference/fastvideo/models/dits/lingbotworld2/
causal_fast.py (:226-776): the self-forcing causal Wan (rolling KV window
with a frozen sink, cached cross-attn text K/V, distilled few-step chunk
denoise) plus the LingBot camera FiLM — patchified Plücker maps through a
SiLU residual MLP, per-token (scale, shift) applied between the
self-attention residual and cross-attention.

TPU shape: rides the CausalWan cache design (static rolling buffers,
masked invalid slots) — see models/dits/causal_wan.py; the camera branch
threads through ``forward_block`` as an extra per-chunk embedding.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
from fastvideo_tpu.layers.embeddings import PatchEmbed3D, unpatchify
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.rotary import get_rotary_pos_embed_wan
from fastvideo_tpu.models.dits.causal_wan import (CausalWanTransformer3DModel,
                                                  CausalWanTransformerBlock,
                                                  cached_self_attention)
from fastvideo_tpu.models.dits.lingbotworld import (
    LINGBOTWORLD_PARAM_NAMES_MAPPING)
from fastvideo_tpu.layers.rotary import apply_rotary_emb

Array = jax.Array


@dataclasses.dataclass
class LingBotWorld2CausalFastArchConfig(WanArchConfig):
    """(reference configs/models/dits/lingbotworld2.py:12-48)."""

    in_channels: int = 36
    out_channels: int = 16
    local_attn_size: int = 18
    sink_size: int = 6
    chunk_size: int = 4
    sample_shift: float = 10.0
    timesteps_index: tuple[int, ...] = (0, 250, 500, 750)
    max_area: int = 480 * 832
    cam_in_channels: int = 6 * 64


@dataclasses.dataclass
class LingBotWorld2CausalFastVideoConfig(ModelConfig):
    arch_config: LingBotWorld2CausalFastArchConfig = dataclasses.field(
        default_factory=LingBotWorld2CausalFastArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(LINGBOTWORLD_PARAM_NAMES_MAPPING))


class LingBotWorld2CausalBlock(CausalWanTransformerBlock):
    """Causal block + camera FiLM (reference CausalWanAttentionBlock
    :399-489: FiLM between the self-attn residual and cross-attn)."""

    def __init__(self, dim: int, ffn_dim: int, num_heads: int,
                 qk_norm: str = "rms_norm_across_heads", eps: float = 1e-6,
                 added_kv_proj_dim: int | None = None, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        super().__init__(dim, ffn_dim, num_heads, qk_norm, eps,
                         added_kv_proj_dim, param_dtype=param_dtype,
                         rngs=rngs)
        from fastvideo_tpu.models.dits.lingbotworld import (
            LingBotWorldCamConditioner)

        self.cam_conditioner = LingBotWorldCamConditioner(
            dim, param_dtype=param_dtype, rngs=rngs)

    def causal_forward(self, hidden_states: Array,
                       encoder_hidden_states: Array, temb: Array,
                       freqs_cis, kv_cache: dict,
                       crossattn_cache: dict | None,
                       cam_emb: Array | None = None):
        orig_dtype = hidden_states.dtype
        b = hidden_states.shape[0]
        n, d = self.num_heads, self.dim // self.num_heads

        e = self.scale_shift_table.value + temb.astype(jnp.float32)
        mods = [e[:, i:i + 1] for i in range(6)]
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = mods

        norm_hidden = self.norm1._norm_f32(hidden_states)
        norm_hidden = (norm_hidden * (1.0 + scale_msa) + shift_msa).astype(
            orig_dtype)
        q = self.norm_q(self.to_q(norm_hidden)).reshape(b, -1, n, d)
        k = self.norm_k(self.to_k(norm_hidden)).reshape(b, -1, n, d)
        v = self.to_v(norm_hidden).reshape(b, -1, n, d)
        cos, sin = freqs_cis
        q = apply_rotary_emb(q, cos, sin)
        k = apply_rotary_emb(k, cos, sin)
        attn_out, kv_cache = cached_self_attention(q, k, v, kv_cache,
                                                   scale=d**-0.5)
        attn_out = self.to_out(attn_out.reshape(b, -1, self.dim))

        zero = jnp.zeros((), jnp.float32)
        norm_hidden, hidden_states = self.self_attn_residual_norm(
            hidden_states, attn_out, gate_msa, zero, zero)
        if cam_emb is not None:
            hidden_states = self.cam_conditioner(
                hidden_states, cam_emb.astype(hidden_states.dtype))
            norm_hidden = self.self_attn_residual_norm.norm._norm_f32(
                hidden_states).astype(orig_dtype)

        ca = self.attn2
        qx = ca.norm_q(ca.to_q(norm_hidden)).reshape(b, -1, n, d)
        if crossattn_cache is not None and "k" in crossattn_cache:
            kx, vx = crossattn_cache["k"], crossattn_cache["v"]
        else:
            kx = ca.norm_k(ca.to_k(encoder_hidden_states)).reshape(
                b, -1, n, d)
            vx = ca.to_v(encoder_hidden_states).reshape(b, -1, n, d)
            if crossattn_cache is not None:
                crossattn_cache["k"] = kx
                crossattn_cache["v"] = vx
        x_out = jax.nn.dot_product_attention(qx, kx.astype(qx.dtype),
                                             vx.astype(qx.dtype))
        attn_out = ca.to_out(x_out.reshape(b, -1, self.dim))
        one = jnp.ones((), jnp.float32)
        norm_hidden, hidden_states = self.cross_attn_residual_norm(
            hidden_states, attn_out, one, c_shift, c_scale)

        ff = self.ffn(norm_hidden)
        hidden_states = self.mlp_residual(hidden_states, ff, c_gate)
        return hidden_states.astype(orig_dtype), kv_cache


class LingBotWorld2CausalFastTransformer3DModel(CausalWanTransformer3DModel):
    """(reference :514-776)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(config, param_dtype=param_dtype, rngs=rngs)
        rngs2 = nnx.Rngs(0)
        self.blocks = nnx.List([
            LingBotWorld2CausalBlock(
                self.inner_dim, config.ffn_dim, config.num_attention_heads,
                config.qk_norm, config.eps, config.added_kv_proj_dim,
                param_dtype=param_dtype, rngs=rngs2)
            for _ in range(config.num_layers)
        ])
        self.patch_embedding_wancamctrl = PatchEmbed3D(
            getattr(config, "cam_in_channels", 6 * 64), self.inner_dim,
            config.patch_size, param_dtype=param_dtype, rngs=rngs)
        self.c2ws_mlp = MLP(self.inner_dim, self.inner_dim, self.inner_dim,
                            bias=True, act_type="silu",
                            param_dtype=param_dtype, rngs=rngs)

    def forward_block(self, hidden_states: Array,
                      encoder_hidden_states: Array, timestep: Array,
                      kv_caches: list[dict],
                      crossattn_caches: list[dict] | None = None,
                      start_frame: int = 0,
                      freqs_cis: tuple[Array, Array] | None = None,
                      c2ws_plucker_emb: Array | None = None):
        """One streaming chunk; ``hidden_states`` already carries the I2V
        condition concat ([noise(16) | mask+cond(20)] = 36 channels).
        ``c2ws_plucker_emb`` [B, C_cam, Tb, h, w] covers this chunk."""
        cfg = self.config
        b, c, t, h, w = hidden_states.shape
        pt, ph, pw = cfg.patch_size
        gt, gh, gw = t // pt, h // ph, w // pw
        if freqs_cis is not None:
            cos, sin = freqs_cis
        else:
            cos, sin = get_rotary_pos_embed_wan((gt, gh, gw),
                                                cfg.attention_head_dim,
                                                cfg.rope_theta,
                                                start_frame=start_frame)
        x = self.patch_embedding(hidden_states)
        cam_emb = None
        if c2ws_plucker_emb is not None:
            cam_emb = self.patch_embedding_wancamctrl(
                c2ws_plucker_emb.astype(x.dtype))
            cam_emb = cam_emb + self.c2ws_mlp(cam_emb)

        temb, timestep_proj, ctx, _ = self.condition_embedder(
            timestep.reshape(-1), encoder_hidden_states, None, None)
        timestep_proj = timestep_proj.reshape(timestep_proj.shape[0], 6, -1)
        ctx = ctx.astype(x.dtype)

        new_caches = []
        for block, cache, ca_cache in zip(
                self.blocks, kv_caches,
                crossattn_caches or [None] * len(kv_caches), strict=True):
            x, cache = block.causal_forward(x, ctx, timestep_proj,
                                            (cos, sin), cache, ca_cache,
                                            cam_emb=cam_emb)
            new_caches.append(cache)

        e = self.scale_shift_table.value + temb.astype(jnp.float32)[:, None]
        shift, scale = e[:, 0:1], e[:, 1:2]
        x = self.norm_out(x, shift, scale)
        x = self.proj_out(x)
        return unpatchify(x, gt, gh, gw, cfg.patch_size,
                          cfg.out_channels), new_caches


EntryClass = LingBotWorld2CausalFastTransformer3DModel
