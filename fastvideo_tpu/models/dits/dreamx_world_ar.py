"""DreamX-World autoregressive causal DiT (5B, streaming blocks).

Behavioral reference: /root/reference/fastvideo/models/dits/
dreamx_world_ar.py (:193-920): the causal Wan trunk (rolling KV window +
sink, cached text K/V) with a PARALLEL causal PRoPE camera branch — the
camera-projected k/v are cached post-projection in their own rolling
window; the branch output projects back through the query cameras'
matrices and a zero-init out_proj.

TPU shape: both attention caches ride the static rolling-buffer design
of models/dits/causal_wan.py; per-frame timestep modulation (block 0's
first frame pinned to t=0) enters as per-token [B, S, 6, C] mods.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.configs.models.dits.dreamx_world import (
    DreamXWorldArchConfig)
from fastvideo_tpu.layers.rotary import (apply_rotary_emb,
                                         get_rotary_pos_embed_wan)
from fastvideo_tpu.models.dits.causal_wan import (CausalWanTransformer3DModel,
                                                  CausalWanTransformerBlock,
                                                  cached_self_attention,
                                                  init_layer_cache)
from fastvideo_tpu.models.dits.dreamx_world import (DreamXPropeSelfAttention,
                                                    apply_tiled_projmat,
                                                    prope_qkv)
from fastvideo_tpu.models.dits.lingbotworld import (
    LINGBOTWORLD_PARAM_NAMES_MAPPING)

Array = jax.Array


@dataclasses.dataclass
class DreamXWorldARArchConfig(DreamXWorldArchConfig):
    """(reference configs/models/dits/dreamx_world.py:26-66)."""

    attn_compress: int = 4
    cam_self_attn_layers: tuple[int, ...] | None = tuple(range(30))
    local_attn_size: int = 12
    sink_size: int = 3
    num_frames_per_block: int = 3


@dataclasses.dataclass
class DreamXWorldARVideoConfig(ModelConfig):
    arch_config: DreamXWorldARArchConfig = dataclasses.field(
        default_factory=DreamXWorldARArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(LINGBOTWORLD_PARAM_NAMES_MAPPING))


class CausalDreamXPropeSelfAttention(DreamXPropeSelfAttention):
    """PRoPE branch with a rolling cache of the PROJECTED k/v
    (reference CausalPropeSelfAttention:371-511)."""

    def causal_forward(self, x: Array, y_camera: dict[str, Array],
                       cache: dict) -> tuple[Array, dict]:
        b, s, _ = x.shape
        n, d = self.num_heads, self.head_dim
        q = self.q_proj(x)
        k = self.k_proj(x)
        v = self.v_proj(x).reshape(b, s, n, d)
        if self.qk_norm == "rms_norm":
            q = self.norm_q(q.reshape(b, s, n, d)).astype(x.dtype)
            k = self.norm_k(k.reshape(b, s, n, d)).astype(x.dtype)
        else:
            q = self.norm_q(q).astype(x.dtype).reshape(b, s, n, d)
            k = self.norm_k(k).astype(x.dtype).reshape(b, s, n, d)
        qp, kp, vp, proj = prope_qkv(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            y_camera["viewmats"].astype(jnp.float32),
            y_camera["K"].astype(jnp.float32))
        # cache the projected keys/values (camera applied at write time,
        # reference :466-476)
        out, cache = cached_self_attention(
            qp.transpose(0, 2, 1, 3).astype(x.dtype),
            kp.transpose(0, 2, 1, 3).astype(x.dtype),
            vp.transpose(0, 2, 1, 3).astype(x.dtype), cache, scale=d**-0.5)
        out = apply_tiled_projmat(out.transpose(0, 2, 1, 3), proj)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, -1)
        return self.out_proj(out.astype(x.dtype)), cache


class DreamXWorldARBlock(CausalWanTransformerBlock):
    """Causal block + parallel causal PRoPE branch; per-token modulation
    (reference CausalWanAttentionBlock:514-602)."""

    def __init__(self, dim: int, ffn_dim: int, num_heads: int,
                 qk_norm: str = "rms_norm_across_heads", eps: float = 1e-6,
                 added_kv_proj_dim: int | None = None,
                 attn_compress: int = 1, add_cam: bool = True, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        super().__init__(dim, ffn_dim, num_heads, qk_norm, eps,
                         added_kv_proj_dim, param_dtype=param_dtype,
                         rngs=rngs)
        if add_cam:
            self.cam_self_attn = CausalDreamXPropeSelfAttention(
                dim, dim // attn_compress, num_heads, qk_norm=qk_norm,
                eps=eps, param_dtype=param_dtype, rngs=rngs)
        else:
            self.cam_self_attn = nnx.data(None)

    def causal_forward(self, hidden_states: Array,
                       encoder_hidden_states: Array, temb: Array,
                       freqs_cis, kv_cache: dict,
                       crossattn_cache: dict | None,
                       y_camera: dict[str, Array] | None = None,
                       cam_cache: dict | None = None):
        orig_dtype = hidden_states.dtype
        b = hidden_states.shape[0]
        n, d = self.num_heads, self.dim // self.num_heads

        if temb.ndim == 4:
            # per-token modulation [B, S, 6, C]
            e = self.scale_shift_table.value[None] + temb.astype(jnp.float32)
            mods = [e[:, :, i] for i in range(6)]
        else:
            e = self.scale_shift_table.value + temb.astype(jnp.float32)
            mods = [e[:, i:i + 1] for i in range(6)]
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = mods

        norm_hidden = self.norm1._norm_f32(hidden_states)
        attn_input = (norm_hidden * (1.0 + scale_msa) + shift_msa).astype(
            orig_dtype)
        q = self.norm_q(self.to_q(attn_input)).reshape(b, -1, n, d)
        k = self.norm_k(self.to_k(attn_input)).reshape(b, -1, n, d)
        v = self.to_v(attn_input).reshape(b, -1, n, d)
        cos, sin = freqs_cis
        q = apply_rotary_emb(q, cos, sin)
        k = apply_rotary_emb(k, cos, sin)
        attn_out, kv_cache = cached_self_attention(q, k, v, kv_cache,
                                                   scale=d**-0.5)
        attn_out = self.to_out(attn_out.reshape(b, -1, self.dim))
        if self.cam_self_attn is not None and y_camera is not None:
            # parallel camera branch on the SAME modulated input
            # (reference :577-585)
            cam_out, cam_cache = self.cam_self_attn.causal_forward(
                attn_input, y_camera, cam_cache)
            attn_out = attn_out + cam_out

        zero = jnp.zeros((), jnp.float32)
        norm_hidden, hidden_states = self.self_attn_residual_norm(
            hidden_states, attn_out, gate_msa, zero, zero)

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
        return hidden_states.astype(orig_dtype), kv_cache, cam_cache


class DreamXWorldARTransformer3DModel(CausalWanTransformer3DModel):
    """(reference :628-920)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(config, param_dtype=param_dtype, rngs=rngs)
        rngs2 = nnx.Rngs(0)
        cam_layers = getattr(config, "cam_self_attn_layers", None)
        self.blocks = nnx.List([
            DreamXWorldARBlock(
                self.inner_dim, config.ffn_dim, config.num_attention_heads,
                config.qk_norm, config.eps, config.added_kv_proj_dim,
                attn_compress=getattr(config, "attn_compress", 1),
                add_cam=(cam_layers is None or i in cam_layers),
                param_dtype=param_dtype, rngs=rngs2)
            for i in range(config.num_layers)
        ])

    def init_cam_caches(self, batch_size: int, frame_seqlen: int,
                        dtype=jnp.bfloat16) -> list[dict | None]:
        cfg = self.config
        window = (cfg.local_attn_size if cfg.local_attn_size != -1 else
                  getattr(cfg, "sliding_window_num_frames", 21)) * \
            frame_seqlen
        sink = cfg.sink_size * frame_seqlen
        out = []
        for block in self.blocks:
            cam = block.cam_self_attn
            if cam is None:
                out.append(None)
            else:
                out.append(init_layer_cache(batch_size, window, sink,
                                            cam.num_heads, cam.head_dim,
                                            dtype))
        return out

    def forward_block(self, hidden_states: Array,
                      encoder_hidden_states: Array, timestep: Array,
                      kv_caches: list[dict],
                      crossattn_caches: list[dict] | None = None,
                      start_frame: int = 0,
                      freqs_cis: tuple[Array, Array] | None = None,
                      y_camera: dict[str, Array] | None = None,
                      cam_caches: list[dict | None] | None = None):
        """One streaming block. ``timestep`` [B] or per-token [B, S]
        (block 0 pins the conditioned first frame's tokens to 0)."""
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

        ts_seq_len = timestep.shape[1] if timestep.ndim == 2 else None
        if ts_seq_len is not None:
            timestep = timestep.reshape(-1)
        temb, timestep_proj, ctx, _ = self.condition_embedder(
            timestep, encoder_hidden_states, None, ts_seq_len)
        if ts_seq_len is not None:
            timestep_proj = timestep_proj.reshape(
                *timestep_proj.shape[:2], 6, -1)
        else:
            timestep_proj = timestep_proj.reshape(timestep_proj.shape[0],
                                                  6, -1)
        ctx = ctx.astype(x.dtype)

        new_caches: list[dict] = []
        new_cam_caches: list[dict | None] = []
        cam_caches = cam_caches or [None] * len(kv_caches)
        for block, cache, ca_cache, cam_cache in zip(
                self.blocks, kv_caches,
                crossattn_caches or [None] * len(kv_caches), cam_caches,
                strict=True):
            x, cache, cam_cache = block.causal_forward(
                x, ctx, timestep_proj, (cos, sin), cache, ca_cache,
                y_camera=y_camera, cam_cache=cam_cache)
            new_caches.append(cache)
            new_cam_caches.append(cam_cache)

        if temb.ndim == 3:
            e = (self.scale_shift_table.value[None] +
                 temb.astype(jnp.float32)[:, :, None])
            shift, scale = e[:, :, 0], e[:, :, 1]
        else:
            e = self.scale_shift_table.value + temb.astype(
                jnp.float32)[:, None]
            shift, scale = e[:, 0:1], e[:, 1:2]
        x = self.norm_out(x, shift, scale)
        x = self.proj_out(x)
        from fastvideo_tpu.layers.embeddings import unpatchify

        return unpatchify(x, gt, gh, gw, cfg.patch_size,
                          cfg.out_channels), new_caches, new_cam_caches


EntryClass = DreamXWorldARTransformer3DModel
