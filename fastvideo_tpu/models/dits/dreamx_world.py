"""DreamX-World DiT: Wan trunk + PRoPE projective camera attention.

Behavioral reference: /root/reference/fastvideo/models/dits/
dreamx_world.py (:29-509): each block adds a parallel camera
self-attention branch whose q is projected by (K_norm @ viewmat)^T, k/v
by its inverse, and the attention output by the projection again —
PRoPE's projective rope over 4x4 camera matrices applied tiled across
head_dim/4 chunks. The branch output projection is zero-initialized so
camera conditioning starts off. The trunk is the Wan transformer
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.attention import LocalAttention
from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import RMSNorm
from fastvideo_tpu.models.dits.wan import (WanTransformer3DModel,
                                           WanTransformerBlock)

Array = jax.Array


def _invert_se3(t: Array) -> Array:
    rot_inv = jnp.swapaxes(t[..., :3, :3], -1, -2)
    trans = -jnp.einsum("...ij,...j->...i", rot_inv, t[..., :3, 3])
    out = jnp.zeros_like(t)
    out = out.at[..., :3, :3].set(rot_inv)
    out = out.at[..., :3, 3].set(trans)
    out = out.at[..., 3, 3].set(t[..., 3, 3])
    return out


def _lift_k(k: Array) -> Array:
    out = jnp.zeros(k.shape[:-2] + (4, 4), k.dtype)
    out = out.at[..., :3, :3].set(k)
    out = out.at[..., 3, 3].set(1.0)
    return out


def _invert_k(k: Array) -> Array:
    out = jnp.zeros_like(k)
    out = out.at[..., 0, 0].set(1.0 / k[..., 0, 0])
    out = out.at[..., 1, 1].set(1.0 / k[..., 1, 1])
    out = out.at[..., 0, 2].set(-k[..., 0, 2] / k[..., 0, 0])
    out = out.at[..., 1, 2].set(-k[..., 1, 2] / k[..., 1, 1])
    out = out.at[..., 2, 2].set(1.0)
    return out


def apply_tiled_projmat(feats: Array, matrix: Array) -> Array:
    """feats [B, H, S, D]; matrix [B, S|cams, 4, 4] (reference :61-78)."""
    b, n, s, d = feats.shape
    p = matrix.shape[-1]
    if matrix.shape[1] == s:
        f = feats.reshape(b, n, s, d // p, p)
        out = jnp.einsum("btij,bntpj->bntpi", matrix, f)
        return out.reshape(b, n, s, d)
    cams = matrix.shape[1]
    f = feats.reshape(b, n, cams, -1, d // p, p)
    out = jnp.einsum("bcij,bncpkj->bncpki", matrix, f)
    return out.reshape(b, n, s, d)


def prope_qkv(q: Array, k: Array, v: Array, viewmats: Array,
              intrinsics: Array):
    """(reference :81-107); q/k/v [B, H, S, D]."""
    k_norm = jnp.zeros_like(intrinsics)
    k_norm = k_norm.at[..., 0, 0].set(intrinsics[..., 0, 0])
    k_norm = k_norm.at[..., 1, 1].set(intrinsics[..., 1, 1])
    k_norm = k_norm.at[..., 2, 2].set(1.0)

    proj = jnp.einsum("...ij,...jk->...ik", _lift_k(k_norm), viewmats)
    proj_t = jnp.swapaxes(proj, -1, -2).astype(viewmats.dtype)
    proj_inv = jnp.einsum("...ij,...jk->...ik", _invert_se3(viewmats),
                          _lift_k(_invert_k(k_norm))).astype(viewmats.dtype)
    q = apply_tiled_projmat(q, proj_t)
    k = apply_tiled_projmat(k, proj_inv)
    v = apply_tiled_projmat(v, proj_inv)
    return q, k, v, proj


class DreamXPropeSelfAttention(nnx.Module):
    """(reference :110-219); zero-init out_proj."""

    def __init__(self, dim: int, attn_dim: int, num_heads: int,
                 qk_norm: str = "rms_norm_across_heads", eps: float = 1e-6,
                 *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = num_heads
        self.head_dim = attn_dim // num_heads
        self.qk_norm = qk_norm
        self.q_proj = Linear(dim, attn_dim, **kw)
        self.k_proj = Linear(dim, attn_dim, **kw)
        self.v_proj = Linear(dim, attn_dim, **kw)
        self.out_proj = Linear(attn_dim, dim, **kw)
        self.out_proj.kernel.value = jnp.zeros_like(
            self.out_proj.kernel.value)
        norm_dim = self.head_dim if qk_norm == "rms_norm" else attn_dim
        self.norm_q = RMSNorm(norm_dim, eps=eps, **kw)
        self.norm_k = RMSNorm(norm_dim, eps=eps, **kw)
        self.attn = LocalAttention(num_heads, self.head_dim)

    def __call__(self, x: Array, y_camera: dict[str, Array]) -> Array:
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
        # PRoPE projection in [B, H, S, D]
        q, k, v, proj = prope_qkv(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            y_camera["viewmats"].astype(jnp.float32),
            y_camera["K"].astype(jnp.float32))
        out = self.attn(q.transpose(0, 2, 1, 3).astype(x.dtype),
                        k.transpose(0, 2, 1, 3).astype(x.dtype),
                        v.transpose(0, 2, 1, 3).astype(x.dtype))
        out = apply_tiled_projmat(out.transpose(0, 2, 1, 3), proj)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, -1)
        return self.out_proj(out.astype(x.dtype))


class DreamXWorldTransformerBlock(WanTransformerBlock):
    """Wan block + parallel PRoPE camera branch (reference :222-336)."""

    def __init__(self, dim: int, ffn_dim: int, num_heads: int,
                 qk_norm: str = "rms_norm_across_heads", eps: float = 1e-6,
                 added_kv_proj_dim: int | None = None,
                 add_control_adapter: bool = True,
                 cam_method: str | None = "prope", attn_compress: int = 1,
                 cam_self_attn_layers: tuple[int, ...] | None = None,
                 layer_idx: int | None = None, *, param_dtype,
                 rngs: nnx.Rngs):
        super().__init__(dim, ffn_dim, num_heads, qk_norm, eps,
                         added_kv_proj_dim, param_dtype=param_dtype,
                         rngs=rngs)
        add_cam = add_control_adapter and cam_method == "prope"
        if add_cam and cam_self_attn_layers is not None:
            add_cam = layer_idx in cam_self_attn_layers
        self.cam_self_attn = (DreamXPropeSelfAttention(
            dim, dim // attn_compress, num_heads // attn_compress,
            qk_norm=qk_norm, eps=eps, param_dtype=param_dtype, rngs=rngs)
                              if add_cam else None)

    def __call__(self, hidden_states: Array, encoder_hidden_states: Array,
                 temb: Array, freqs_cis, kv_valid=None, grid=None,
                 pre_tiled: bool = False,
                 y_camera: dict[str, Array] | None = None) -> Array:
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
        if self.cam_self_attn is not None and y_camera is not None:
            attn_out = attn_out + self.cam_self_attn(norm_hidden, y_camera)

        zero = jnp.zeros((), jnp.float32)
        norm_hidden, hidden_states = self.self_attn_residual_norm(
            hidden_states, attn_out, gate_msa, zero, zero)

        attn_out = self.attn2(norm_hidden, encoder_hidden_states)
        one = jnp.ones((), jnp.float32)
        norm_hidden, hidden_states = self.cross_attn_residual_norm(
            hidden_states, attn_out, one, c_shift, c_scale)

        ff = self.ffn(norm_hidden)
        hidden_states = self.mlp_residual(hidden_states, ff, c_gate)
        return hidden_states.astype(orig_dtype)


class DreamXWorldTransformer3DModel(WanTransformer3DModel):
    """(reference :339-506)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(config, param_dtype=param_dtype, rngs=rngs)
        inner_dim = self.inner_dim
        self.blocks = nnx.List([
            DreamXWorldTransformerBlock(
                inner_dim, config.ffn_dim, config.num_attention_heads,
                config.qk_norm, config.eps, config.added_kv_proj_dim,
                add_control_adapter=getattr(config, "add_control_adapter",
                                            True),
                cam_method=getattr(config, "cam_method", "prope"),
                attn_compress=getattr(config, "attn_compress", 1),
                cam_self_attn_layers=getattr(config, "cam_self_attn_layers",
                                             None),
                layer_idx=i, param_dtype=param_dtype, rngs=rngs)
            for i in range(config.num_layers)
        ])

    def __call__(self, hidden_states: Array, encoder_hidden_states: Array,
                 timestep: Array, encoder_hidden_states_image=None,
                 y_camera: dict[str, Array] | None = None,
                 **kwargs) -> Array:
        if y_camera is None:
            return super().__call__(hidden_states, encoder_hidden_states,
                                    timestep, encoder_hidden_states_image)
        self._y_camera = y_camera
        try:
            # thread the camera dict through the Wan trunk by temporarily
            # wrapping each block call
            return self._forward_with_camera(hidden_states,
                                             encoder_hidden_states, timestep,
                                             encoder_hidden_states_image)
        finally:
            self._y_camera = None

    def _forward_with_camera(self, hidden_states, encoder_hidden_states,
                             timestep, encoder_hidden_states_image):
        from fastvideo_tpu.layers.rotary import get_rotary_pos_embed_wan
        from fastvideo_tpu.parallel import (pad_rope_to, pad_tokens_to,
                                            shard_seq, unshard_seq)

        cfg = self.config
        b, c, t, h, w = hidden_states.shape
        pt, ph, pw = cfg.patch_size
        gt, gh, gw = t // pt, h // ph, w // pw
        cos, sin = get_rotary_pos_embed_wan((gt, gh, gw),
                                            cfg.attention_head_dim,
                                            cfg.rope_theta)
        x = self.patch_embedding(hidden_states)
        x, orig_seq_len = shard_seq(x)
        cos, sin = pad_rope_to(cos, sin, x.shape[1])
        kv_valid = orig_seq_len if x.shape[1] != orig_seq_len else None

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
            temb = pad_tokens_to(temb, x.shape[1])
        else:
            timestep_proj = timestep_proj.reshape(timestep_proj.shape[0], 6,
                                                  -1)
        if enc_image is not None:
            encoder_hidden_states = jnp.concatenate(
                [enc_image, encoder_hidden_states], axis=1)
        encoder_hidden_states = encoder_hidden_states.astype(x.dtype)

        for block in self.blocks:
            x = block(x, encoder_hidden_states, timestep_proj, (cos, sin),
                      kv_valid, grid=(gt, gh, gw), y_camera=self._y_camera)

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
        from fastvideo_tpu.layers.embeddings import unpatchify

        return unpatchify(x, gt, gh, gw, cfg.patch_size, cfg.out_channels)


EntryClass = DreamXWorldTransformer3DModel
