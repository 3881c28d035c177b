"""HY-World (WorldPlay) DiT: hy1.5 trunk + PRoPE camera attention +
action conditioning.

Behavioral reference: /root/reference/fastvideo/models/dits/hyworld/
hyworld.py (:44-568) + camera_rope.py: each double block runs a SECOND
attention pass over PRoPE-projected q/k/v (no RoPE there) whose output
is re-projected and added through a zero-init projection; the timestep
embedding is PER-FRAME (one timestep per latent frame, action embedding
added per frame, broadcast to every spatial token); text conditioning
uses a separate ``timestep_txt``; the final layer modulates per token.

Token-reorder note: the reference packs valid text tokens first via
boolean masks (hyworld.py:479-524). With this framework's uniform-length
streams those masks are all-ones (or all-zeros for the t2v image
stream), for which the packing reduces to the static concat
[image | byt5 | mllm] implemented here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.layers.embeddings import (ModulateProjection,
                                             TimestepEmbedder, unpatchify)
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import FP32LayerNorm
from fastvideo_tpu.layers.rotary import get_nd_rotary_pos_embed
from fastvideo_tpu.models.dits.dreamx_world import prope_qkv
from fastvideo_tpu.models.dits.hunyuan import MMDoubleStreamBlock
from fastvideo_tpu.models.dits.hunyuan15 import (
    HunyuanVideo15Transformer3DModel)
from fastvideo_tpu.parallel import shard_seq, unshard_seq

Array = jax.Array


def _mods(proj, vec):
    """6-way modulation split supporting [B, C] and per-token [B, S, C]."""
    mods = jnp.split(proj(vec), 6, axis=-1)
    if vec.ndim == 2:
        return [m[:, None] for m in mods]
    return mods


class HYWorldDoubleStreamBlock(MMDoubleStreamBlock):
    """(reference hyworld.py:44-244)."""

    def __init__(self, hidden_size: int, num_heads: int, mlp_ratio: float,
                 *, param_dtype, rngs: nnx.Rngs):
        super().__init__(hidden_size, num_heads, mlp_ratio,
                         param_dtype=param_dtype, rngs=rngs)
        self.img_attn_prope_proj = Linear(hidden_size, hidden_size,
                                          param_dtype=param_dtype, rngs=rngs)
        self.img_attn_prope_proj.kernel.value = jnp.zeros_like(
            self.img_attn_prope_proj.kernel.value)

    def __call__(self, img: Array, txt: Array, vec: Array,
                 vec_txt: Array | None = None, freqs_cis=None,
                 kv_valid=None, viewmats: Array | None = None,
                 Ks: Array | None = None):
        (i_shift, i_scale, i_gate, i_mshift, i_mscale,
         i_mgate) = _mods(self.img_mod, vec)
        (t_shift, t_scale, t_gate, t_mshift, t_mscale,
         t_mgate) = _mods(self.txt_mod,
                          vec_txt if vec_txt is not None else vec)

        img_in = self.img_attn_norm(img, i_shift, i_scale)
        img_q, img_k, img_v = self._qkv(img_in, self.img_attn_qkv,
                                        self.img_attn_q_norm,
                                        self.img_attn_k_norm)
        txt_in = self.txt_attn_norm(txt, t_shift, t_scale)
        txt_q, txt_k, txt_v = self._qkv(txt_in, self.txt_attn_qkv,
                                        self.txt_attn_q_norm,
                                        self.txt_attn_k_norm)

        b = img.shape[0]
        img_attn, txt_attn = self.attn.joint_forward(
            img_q, img_k, img_v, txt_q, txt_k, txt_v, freqs_cis=freqs_cis,
            kv_valid=kv_valid)

        # PRoPE parallel pass: projected q/k/v, NO rope (reference :197-216)
        pq, pk, pv, proj = prope_qkv(
            img_q.transpose(0, 2, 1, 3), img_k.transpose(0, 2, 1, 3),
            img_v.transpose(0, 2, 1, 3), viewmats.astype(jnp.float32),
            Ks.astype(jnp.float32))
        pq = pq.transpose(0, 2, 1, 3).astype(img.dtype)
        pk = pk.transpose(0, 2, 1, 3).astype(img.dtype)
        pv = pv.transpose(0, 2, 1, 3).astype(img.dtype)
        img_attn_prope, _ = self.attn.joint_forward(
            pq, pk, pv, txt_q, txt_k, txt_v, freqs_cis=None,
            kv_valid=kv_valid)
        from fastvideo_tpu.models.dits.dreamx_world import \
            apply_tiled_projmat

        img_attn_prope = apply_tiled_projmat(
            img_attn_prope.transpose(0, 2, 1, 3).astype(jnp.float32),
            proj).transpose(0, 2, 1, 3)

        img_attn_out = self.img_attn_proj(
            img_attn.reshape(b, img.shape[1], -1))
        img_attn_out = img_attn_out + self.img_attn_prope_proj(
            img_attn_prope.reshape(b, img.shape[1], -1).astype(img.dtype))

        img_mlp_in, img_res = self.img_attn_residual_mlp_norm(
            img, img_attn_out, i_gate, i_mshift, i_mscale)
        img = self.img_mlp_residual(img_res, self.img_mlp(img_mlp_in),
                                    i_mgate)

        txt_attn_out = self.txt_attn_proj(
            txt_attn.reshape(b, txt.shape[1], -1))
        txt_mlp_in, txt_res = self.txt_attn_residual_mlp_norm(
            txt, txt_attn_out, t_gate, t_mshift, t_mscale)
        txt = self.txt_mlp_residual(txt_res, self.txt_mlp(txt_mlp_in),
                                    t_mgate)
        return img, txt


class HYWorldFinalLayer(nnx.Module):
    """Per-token (shift, scale) final modulation (reference :247-292)."""

    def __init__(self, hidden_size: int, patch_size: tuple[int, int, int],
                 out_channels: int, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm_final = FP32LayerNorm(hidden_size, 1e-6, False, **kw)
        out_dim = patch_size[0] * patch_size[1] * patch_size[2] * out_channels
        self.linear = Linear(hidden_size, out_dim, **kw)
        self.adaLN_modulation = ModulateProjection(hidden_size, factor=2,
                                                   act_layer="silu", **kw)

    def __call__(self, x: Array, c: Array) -> Array:
        shift, scale = jnp.split(self.adaLN_modulation(c), 2, axis=-1)
        if c.ndim == 2:
            shift, scale = shift[:, None], scale[:, None]
        x = self.norm_final(x).astype(x.dtype) * \
            (1.0 + scale.astype(x.dtype)) + shift.astype(x.dtype)
        return self.linear(x)


class HYWorldTransformer3DModel(HunyuanVideo15Transformer3DModel):
    """(reference hyworld.py:295-568)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(config, param_dtype=param_dtype, rngs=rngs)
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        hidden = config.hidden_size
        self.double_blocks = nnx.List([
            HYWorldDoubleStreamBlock(hidden, config.num_attention_heads,
                                     config.mlp_ratio, **kw)
            for _ in range(config.num_layers)
        ])
        self.action_in = TimestepEmbedder(hidden, act_layer="silu", **kw)
        # zero-init: action conditioning starts off (reference :335-338)
        self.action_in.mlp.fc_out.kernel.value = jnp.zeros_like(
            self.action_in.mlp.fc_out.kernel.value)
        self.final_layer = HYWorldFinalLayer(hidden, config.patch_size_thw,
                                             self.out_channels, **kw)

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array, encoder_hidden_states_image=None,
                 action: Array | None = None,
                 viewmats: Array | None = None, Ks: Array | None = None,
                 timestep_txt: Array | None = None,
                 timestep_r: Array | None = None, **kwargs) -> Array:
        """timestep is PER-FRAME [B, T] (or flattened [B*T]); action
        matches it; viewmats [B, T, 4, 4]; Ks [B, T, 3, 3]."""
        cfg = self.config
        txt, txt2 = encoder_hidden_states
        if (encoder_hidden_states_image is not None and isinstance(
                encoder_hidden_states_image, (list, tuple))):
            encoder_hidden_states_image = encoder_hidden_states_image[0]

        b, c, ot, oh, ow = hidden_states.shape
        pt, ph, pw = cfg.patch_size_thw
        tt, th, tw = ot // pt, oh // ph, ow // pw
        cos, sin = get_nd_rotary_pos_embed(tuple(cfg.rope_axes_dim),
                                           (tt, th, tw), cfg.rope_theta)
        freqs_cis = (jnp.asarray(cos), jnp.asarray(sin))

        if timestep_txt is None:
            timestep_txt = timestep.reshape(b, -1)[:, 0]
        temb = self.time_in(timestep.reshape(-1), timestep_r)  # [B*T, C]
        temb_txt = self.time_in(timestep_txt, timestep_r)
        if action is not None:
            temb = temb + self.action_in(action.reshape(-1))
        # [B*T, C] -> per-token [B, T*H*W, C]
        temb = temb.reshape(b, tt, 1, -1)
        temb = jnp.broadcast_to(temb, (b, tt, th * tw, temb.shape[-1]))
        temb = temb.reshape(b, tt * th * tw, -1)

        img = self.img_in(hidden_states)
        img, orig_seq_len = shard_seq(img)
        kv_valid = orig_seq_len if img.shape[1] != orig_seq_len else None
        from fastvideo_tpu.parallel import pad_rope_to, pad_tokens_to
        freqs_cis = pad_rope_to(*freqs_cis, img.shape[1])
        temb = pad_tokens_to(temb, img.shape[1])

        # per-token camera matrices
        viewmats_seq = jnp.broadcast_to(
            viewmats[:, :, None], (b, tt, th * tw, 4, 4)).reshape(
                b, tt * th * tw, 4, 4)
        Ks_seq = jnp.broadcast_to(Ks[:, :, None],
                                  (b, tt, th * tw, 3, 3)).reshape(
                                      b, tt * th * tw, 3, 3)
        if viewmats_seq.shape[1] != img.shape[1]:
            # identity cameras on the sp pad tokens (masked in attention)
            pad_n = img.shape[1] - viewmats_seq.shape[1]
            eye4 = jnp.broadcast_to(jnp.eye(4, dtype=viewmats_seq.dtype),
                                    (b, pad_n, 4, 4))
            eye3 = jnp.broadcast_to(jnp.eye(3, dtype=Ks_seq.dtype),
                                    (b, pad_n, 3, 3))
            viewmats_seq = jnp.concatenate([viewmats_seq, eye4], axis=1)
            Ks_seq = jnp.concatenate([Ks_seq, eye3], axis=1)

        txt = self.txt_in(txt.astype(img.dtype), timestep_txt)
        txt = txt + self.cond_type_embed(
            jnp.zeros(txt.shape[:2], jnp.int32)).astype(txt.dtype)
        txt2 = self.txt_in_2(txt2.astype(img.dtype))
        txt2 = txt2 + self.cond_type_embed(
            jnp.ones(txt2.shape[:2], jnp.int32)).astype(txt2.dtype)
        streams = [txt2, txt]
        if encoder_hidden_states_image is not None:
            img_emb = self.image_embedder(
                encoder_hidden_states_image.astype(img.dtype))
            img_emb = img_emb + self.cond_type_embed(
                jnp.full(img_emb.shape[:2], 2, jnp.int32)).astype(
                    img_emb.dtype)
            streams.insert(0, img_emb)
        txt_all = jnp.concatenate(streams, axis=1)

        for block in self.double_blocks:
            img, txt_all = block(img, txt_all, temb, temb_txt, freqs_cis,
                                 kv_valid, viewmats_seq, Ks_seq)

        img = self.final_layer(img, temb)
        img = unshard_seq(img, orig_seq_len)
        return unpatchify(img, tt, th, tw, cfg.patch_size_thw,
                          self.out_channels, feature_order="c_pthw")


EntryClass = HYWorldTransformer3DModel
