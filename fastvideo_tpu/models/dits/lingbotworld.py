"""LingBot-World DiT: Wan trunk + Plücker-ray camera conditioning.

Behavioral reference: /root/reference/fastvideo/models/dits/lingbotworld/
model.py (:37-425): a Wan I2V transformer whose blocks apply a camera
FiLM — patchified Plücker ray maps pass a SiLU MLP (with residual), and
each block derives per-token (scale, shift) applied to the hidden states
AFTER the self-attention residual (the post-injection states are then
re-normalised for cross-attention).

TPU shape: the camera embedding is computed once per forward; each
block's conditioner is per-layer weights, so the trunk still scans
(stacked block params) with the camera embedding as a scan constant.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.dits.wan import (WAN_PARAM_NAMES_MAPPING,
                                                   WanArchConfig)
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.models.dits.wan import (WanTransformer3DModel,
                                           WanTransformerBlock)

Array = jax.Array

# the released checkpoint uses the OFFICIAL (non-diffusers) key names
# (reference configs/models/dits/lingbotworld.py:15-50); diffusers-style
# keys (tiny fixtures / converted checkpoints) ride the Wan table below.
LINGBOTWORLD_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^patch_embedding_wancamctrl\.(weight|bias)$":
    r"patch_embedding_wancamctrl.proj.\1",
    r"^c2ws_hidden_states_layer1\.(.*)$": r"c2ws_mlp.fc_in.\1",
    r"^c2ws_hidden_states_layer2\.(.*)$": r"c2ws_mlp.fc_out.\1",
    r"^text_embedding\.0\.(.*)$":
    r"condition_embedder.text_embedder.fc_in.\1",
    r"^text_embedding\.2\.(.*)$":
    r"condition_embedder.text_embedder.fc_out.\1",
    r"^time_embedding\.0\.(.*)$":
    r"condition_embedder.time_embedder.mlp.fc_in.\1",
    r"^time_embedding\.2\.(.*)$":
    r"condition_embedder.time_embedder.mlp.fc_out.\1",
    r"^time_projection\.1\.(.*)$":
    r"condition_embedder.time_modulation.linear.\1",
    r"^img_emb\.proj\.1\.(.*)$":
    r"condition_embedder.image_embedder.ff.fc_in.\1",
    r"^img_emb\.proj\.3\.(.*)$":
    r"condition_embedder.image_embedder.ff.fc_out.\1",
    r"^blocks\.(\d+)\.modulation$": r"blocks.\1.scale_shift_table",
    r"^blocks\.(\d+)\.self_attn\.q\.(.*)$": r"blocks.\1.to_q.\2",
    r"^blocks\.(\d+)\.self_attn\.k\.(.*)$": r"blocks.\1.to_k.\2",
    r"^blocks\.(\d+)\.self_attn\.v\.(.*)$": r"blocks.\1.to_v.\2",
    r"^blocks\.(\d+)\.self_attn\.o\.(.*)$": r"blocks.\1.to_out.\2",
    r"^blocks\.(\d+)\.self_attn\.norm_q\.(.*)$": r"blocks.\1.norm_q.\2",
    r"^blocks\.(\d+)\.self_attn\.norm_k\.(.*)$": r"blocks.\1.norm_k.\2",
    r"^blocks\.(\d+)\.norm3\.(.*)$":
    r"blocks.\1.self_attn_residual_norm.norm.\2",
    r"^blocks\.(\d+)\.cross_attn\.q\.(.*)$": r"blocks.\1.attn2.to_q.\2",
    r"^blocks\.(\d+)\.cross_attn\.k\.(.*)$": r"blocks.\1.attn2.to_k.\2",
    r"^blocks\.(\d+)\.cross_attn\.v\.(.*)$": r"blocks.\1.attn2.to_v.\2",
    r"^blocks\.(\d+)\.cross_attn\.o\.(.*)$": r"blocks.\1.attn2.to_out.\2",
    r"^blocks\.(\d+)\.cross_attn\.norm_q\.(.*)$":
    r"blocks.\1.attn2.norm_q.\2",
    r"^blocks\.(\d+)\.cross_attn\.norm_k\.(.*)$":
    r"blocks.\1.attn2.norm_k.\2",
    r"^blocks\.(\d+)\.ffn\.0\.(.*)$": r"blocks.\1.ffn.fc_in.\2",
    r"^blocks\.(\d+)\.ffn\.2\.(.*)$": r"blocks.\1.ffn.fc_out.\2",
    r"^blocks\.(\d+)\.cam_injector_layer1\.(.*)$":
    r"blocks.\1.cam_conditioner.cam_injector.fc_in.\2",
    r"^blocks\.(\d+)\.cam_injector_layer2\.(.*)$":
    r"blocks.\1.cam_conditioner.cam_injector.fc_out.\2",
    r"^blocks\.(\d+)\.cam_scale_layer\.(.*)$":
    r"blocks.\1.cam_conditioner.cam_scale_layer.\2",
    r"^blocks\.(\d+)\.cam_shift_layer\.(.*)$":
    r"blocks.\1.cam_conditioner.cam_shift_layer.\2",
    r"^head\.modulation$": r"scale_shift_table",
    r"^head\.head\.(.*)$": r"proj_out.\1",
    **WAN_PARAM_NAMES_MAPPING,
}


@dataclasses.dataclass
class LingBotWorldArchConfig(WanArchConfig):
    # Plücker maps enter pixel-space-folded: 6 rays * 8x8 spatial fold
    cam_in_channels: int = 6 * 64


from fastvideo_tpu.configs.models.base import ModelConfig  # noqa: E402


@dataclasses.dataclass
class LingBotWorldVideoConfig(ModelConfig):
    arch_config: LingBotWorldArchConfig = dataclasses.field(
        default_factory=LingBotWorldArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(LINGBOTWORLD_PARAM_NAMES_MAPPING))


class LingBotWorldCamConditioner(nnx.Module):
    """(reference :37-60): FiLM from the camera embedding."""

    def __init__(self, dim: int, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.cam_injector = MLP(dim, dim, dim, bias=True, act_type="silu",
                                **kw)
        self.cam_scale_layer = Linear(dim, dim, **kw)
        self.cam_shift_layer = Linear(dim, dim, **kw)

    def __call__(self, hidden_states: Array, cam_emb: Array) -> Array:
        c = self.cam_injector(cam_emb) + cam_emb
        scale = self.cam_scale_layer(c)
        shift = self.cam_shift_layer(c)
        return (1.0 + scale) * hidden_states + shift


# camera patch embedding: [B, C_cam, T, H_lat, W_lat] -> tokens with
# (C, pt, ph, pw)-ordered features — identical contraction to the Wan
# PatchEmbed3D (reference layers/visual_embedding.py
# WanCamControlPatchEmbedding:58-103), so we reuse it directly.


class LingBotWorldTransformerBlock(WanTransformerBlock):
    """Wan block + camera FiLM after the self-attn residual
    (reference :63-228)."""

    def __init__(self, dim: int, ffn_dim: int, num_heads: int,
                 qk_norm: str = "rms_norm_across_heads", eps: float = 1e-6,
                 added_kv_proj_dim: int | None = None, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        super().__init__(dim, ffn_dim, num_heads, qk_norm, eps,
                         added_kv_proj_dim, param_dtype=param_dtype,
                         rngs=rngs)
        self.cam_conditioner = LingBotWorldCamConditioner(
            dim, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, hidden_states: Array, encoder_hidden_states: Array,
                 temb: Array, freqs_cis, kv_valid=None, grid=None,
                 pre_tiled: bool = False,
                 cam_emb: Array | None = None) -> Array:
        del pre_tiled  # VSA tile-major order: base-scan compat only
        orig_dtype = hidden_states.dtype
        b = hidden_states.shape[0]
        n, d = self.num_heads, self.dim // self.num_heads

        if temb.ndim == 4:
            e = self.scale_shift_table.value[None] + temb.astype(jnp.float32)
            mods = [e[:, :, i] for i in range(6)]
        else:
            e = self.scale_shift_table.value + temb.astype(jnp.float32)
            mods = [e[:, i:i + 1] for i in range(6)]
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = mods

        norm_hidden = self.norm1._norm_f32(hidden_states)
        norm_hidden = (norm_hidden * (1.0 + scale_msa) + shift_msa).astype(
            orig_dtype)
        q = self.norm_q(self.to_q(norm_hidden)).reshape(b, -1, n, d)
        k = self.norm_k(self.to_k(norm_hidden)).reshape(b, -1, n, d)
        v = self.to_v(norm_hidden).reshape(b, -1, n, d)
        attn_out = self.attn1(q, k, v, freqs_cis=freqs_cis,
                              kv_valid=kv_valid, grid=grid)
        attn_out = self.to_out(attn_out.reshape(b, -1, self.dim))

        zero = jnp.zeros((), jnp.float32)
        norm_hidden, hidden_states = self.self_attn_residual_norm(
            hidden_states, attn_out, gate_msa, zero, zero)
        if cam_emb is not None:
            # camera FiLM after the residual; re-normalise for cross-attn
            # (reference :206-215)
            hidden_states = self.cam_conditioner(
                hidden_states, cam_emb.astype(hidden_states.dtype))
            norm_hidden = self.self_attn_residual_norm.norm._norm_f32(
                hidden_states).astype(orig_dtype)

        attn_out = self.attn2(norm_hidden, encoder_hidden_states)
        one = jnp.ones((), jnp.float32)
        norm_hidden, hidden_states = self.cross_attn_residual_norm(
            hidden_states, attn_out, one, c_shift, c_scale)

        ff = self.ffn(norm_hidden)
        hidden_states = self.mlp_residual(hidden_states, ff, c_gate)
        return hidden_states.astype(orig_dtype)


class LingBotWorldTransformer3DModel(WanTransformer3DModel):
    """(reference :230-425)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(config, param_dtype=param_dtype, rngs=rngs)
        inner_dim = self.inner_dim
        self.blocks = nnx.List([
            LingBotWorldTransformerBlock(
                inner_dim, config.ffn_dim, config.num_attention_heads,
                config.qk_norm, config.eps, config.added_kv_proj_dim,
                param_dtype=param_dtype, rngs=rngs)
            for _ in range(config.num_layers)
        ])
        from fastvideo_tpu.layers.embeddings import PatchEmbed3D

        self.patch_embedding_wancamctrl = PatchEmbed3D(
            getattr(config, "cam_in_channels", 6 * 64), inner_dim,
            config.patch_size, param_dtype=param_dtype, rngs=rngs)
        self.c2ws_mlp = MLP(inner_dim, inner_dim, inner_dim, bias=True,
                            act_type="silu", param_dtype=param_dtype,
                            rngs=rngs)

    def _cam_embedding(self, c2ws_plucker_emb: Array,
                       dtype) -> Array:
        emb = self.patch_embedding_wancamctrl(
            c2ws_plucker_emb.astype(dtype))
        return emb + self.c2ws_mlp(emb)

    def __call__(self, hidden_states: Array, encoder_hidden_states: Array,
                 timestep: Array, encoder_hidden_states_image=None,
                 c2ws_plucker_emb: Array | None = None,
                 **kwargs) -> Array:
        if c2ws_plucker_emb is None:
            return super().__call__(hidden_states, encoder_hidden_states,
                                    timestep, encoder_hidden_states_image)
        from fastvideo_tpu.layers.embeddings import unpatchify
        from fastvideo_tpu.layers.rotary import get_rotary_pos_embed_wan
        from fastvideo_tpu.parallel import shard_seq, unshard_seq

        cfg = self.config
        b, c, t, h, w = hidden_states.shape
        pt, ph, pw = cfg.patch_size
        gt, gh, gw = t // pt, h // ph, w // pw
        cos, sin = get_rotary_pos_embed_wan((gt, gh, gw),
                                            cfg.attention_head_dim,
                                            cfg.rope_theta)
        x = self.patch_embedding(hidden_states)
        cam_emb = self._cam_embedding(c2ws_plucker_emb, x.dtype)
        x, orig_seq_len = shard_seq(x)
        cam_emb, _ = shard_seq(cam_emb)
        kv_valid = orig_seq_len if x.shape[1] != orig_seq_len else None
        from fastvideo_tpu.parallel import pad_rope_to, pad_tokens_to
        cos, sin = pad_rope_to(cos, sin, x.shape[1])

        ts_seq_len = timestep.shape[1] if timestep.ndim == 2 else None
        if ts_seq_len is not None:
            timestep = timestep.reshape(-1)
        temb, timestep_proj, encoder_hidden_states, enc_image = (
            self.condition_embedder(timestep, encoder_hidden_states,
                                    encoder_hidden_states_image, ts_seq_len))
        if ts_seq_len is not None:
            timestep_proj = timestep_proj.reshape(
                *timestep_proj.shape[:2], 6, -1)
            timestep_proj = pad_tokens_to(timestep_proj, x.shape[1])
        else:
            timestep_proj = timestep_proj.reshape(timestep_proj.shape[0], 6,
                                                  -1)
        if enc_image is not None:
            encoder_hidden_states = jnp.concatenate(
                [enc_image, encoder_hidden_states], axis=1)
        encoder_hidden_states = encoder_hidden_states.astype(x.dtype)

        for block in self.blocks:
            x = block(x, encoder_hidden_states, timestep_proj, (cos, sin),
                      kv_valid, grid=(gt, gh, gw), cam_emb=cam_emb)

        if temb.ndim == 3:
            e = self.scale_shift_table.value[None] + temb[:, :, None].astype(
                jnp.float32)
            shift, scale = e[:, :, 0], e[:, :, 1]
        else:
            e = self.scale_shift_table.value + temb[:, None].astype(
                jnp.float32)
            shift, scale = e[:, 0:1], e[:, 1:2]
        x = self.norm_out(x, shift, scale)
        x = unshard_seq(x, orig_seq_len)
        x = self.proj_out(x)
        return unpatchify(x, gt, gh, gw, cfg.patch_size, cfg.out_channels)


EntryClass = LingBotWorldTransformer3DModel
