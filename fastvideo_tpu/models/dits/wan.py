"""Wan 2.x video diffusion transformer (T2V / I2V / TI2V), TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/wanvideo.py
(WanTransformer3DModel, :37-809). Re-designed for JAX/XLA:

* patch embed is a reshape+matmul (MXU-friendly) instead of Conv3d;
* sequence parallelism is GSPMD sharding on the token dim plus an explicit
  Ulysses shard_map exchange inside DistributedAttention;
* all AdaLN modulation math is fp32, activations bf16 (matching the
  reference's FP32LayerNorm/ScaleResidual* numerics);
* RoPE is the interleaved rotate-half variant applied to q/k pre-exchange.

Weight names follow the reference module tree so WAN_PARAM_NAMES_MAPPING
(from diffusers checkpoints) applies unchanged.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.attention import DistributedAttention, LocalAttention
from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
from fastvideo_tpu.layers.embeddings import (ModulateProjection, PatchEmbed3D,
                                             TimestepEmbedder, unpatchify)
from fastvideo_tpu.layers.linear import (ColumnParallelLinear, Linear,
                                         RowParallelLinear)
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import (FP32LayerNorm, LayerNormScaleShift,
                                       RMSNorm, ScaleResidual,
                                       ScaleResidualLayerNormScaleShift)
from fastvideo_tpu.layers.rotary import get_rotary_pos_embed_wan
from fastvideo_tpu.parallel import get_sp_size, shard_seq, unshard_seq

Array = jax.Array


class WanImageEmbedding(nnx.Module):
    """CLIP image feature projector (wanvideo.py:38-54)."""

    def __init__(self, in_features: int, out_features: int, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        self.norm1 = FP32LayerNorm(in_features, param_dtype=param_dtype,
                                   rngs=rngs)
        self.ff = MLP(in_features, in_features, out_features, act_type="gelu",
                      param_dtype=param_dtype, rngs=rngs)
        self.norm2 = FP32LayerNorm(out_features, param_dtype=param_dtype,
                                   rngs=rngs)

    def __call__(self, x: Array) -> Array:
        dtype = x.dtype
        h = self.norm1(x)
        h = self.ff(h)
        return self.norm2(h).astype(dtype)


class WanTimeTextImageEmbedding(nnx.Module):
    """Time/text/image conditioning embedder (wanvideo.py:56-149)."""

    def __init__(self, dim: int, time_freq_dim: int, text_embed_dim: int,
                 image_embed_dim: int | None = None, *,
                 r_embedder: bool = False, r_embedder_fusion: str = "additive",
                 r_embedder_gate_value: float = 0.25,
                 r_embedder_deltatime_type: str = "r",
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        self.time_embedder = TimestepEmbedder(
            dim, frequency_embedding_size=time_freq_dim, act_layer="silu",
            param_dtype=param_dtype, rngs=rngs)
        # AnyFlow dual-timestep branch (reference wanvideo.py:92-137):
        # a second TimestepEmbedder whose output is fused into temb by a
        # non-learned gate, additively or as a convex blend.
        if r_embedder:
            if r_embedder_fusion not in ("additive", "gated"):
                raise ValueError(f"bad r_embedder_fusion {r_embedder_fusion}")
            if r_embedder_deltatime_type not in ("r", "t-r"):
                raise ValueError(
                    f"bad r_embedder_deltatime_type {r_embedder_deltatime_type}")
        self.delta_embedder = (TimestepEmbedder(
            dim, frequency_embedding_size=time_freq_dim, act_layer="silu",
            param_dtype=param_dtype, rngs=rngs) if r_embedder else None)
        self.r_fusion = r_embedder_fusion
        self.r_gate = float(r_embedder_gate_value)
        self.r_deltatime_type = r_embedder_deltatime_type
        self.time_modulation = ModulateProjection(
            dim, factor=6, act_layer="silu", param_dtype=param_dtype,
            rngs=rngs)
        self.text_embedder = (MLP(text_embed_dim, dim, dim, bias=True,
                                  act_type="gelu_pytorch_tanh",
                                  param_dtype=param_dtype, rngs=rngs)
                              if text_embed_dim > 0 else None)
        self.image_embedder = (WanImageEmbedding(image_embed_dim, dim,
                                                 param_dtype=param_dtype,
                                                 rngs=rngs)
                               if image_embed_dim is not None else None)

    def __call__(self, timestep: Array, encoder_hidden_states: Array,
                 encoder_hidden_states_image: Array | None = None,
                 timestep_seq_len: int | None = None,
                 r_timestep: Array | None = None):
        temb = self.time_embedder(timestep, timestep_seq_len)
        if self.delta_embedder is not None and r_timestep is not None:
            delta_input = (r_timestep if self.r_deltatime_type == "r"
                           else timestep - r_timestep)
            delta_emb = self.delta_embedder(delta_input, timestep_seq_len)
            if self.r_fusion == "gated":
                temb = (1.0 - self.r_gate) * temb + self.r_gate * delta_emb
            else:
                temb = temb + self.r_gate * delta_emb
        timestep_proj = self.time_modulation(temb)
        if self.text_embedder is not None:
            encoder_hidden_states = self.text_embedder(encoder_hidden_states)
        if encoder_hidden_states_image is not None:
            assert self.image_embedder is not None
            encoder_hidden_states_image = self.image_embedder(
                encoder_hidden_states_image)
        return (temb, timestep_proj, encoder_hidden_states,
                encoder_hidden_states_image)


class WanT2VCrossAttention(nnx.Module):
    """Text cross-attention (wanvideo.py:204-237).

    q is (logically) seq-sharded, context is replicated — attention is fully
    local per device, no collectives.
    """

    def __init__(self, dim: int, num_heads: int, eps: float = 1e-6, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.to_q = ColumnParallelLinear(dim, dim, param_dtype=param_dtype,
                                         rngs=rngs)
        self.to_k = ColumnParallelLinear(dim, dim, param_dtype=param_dtype,
                                         rngs=rngs)
        self.to_v = ColumnParallelLinear(dim, dim, param_dtype=param_dtype,
                                         rngs=rngs)
        self.to_out = RowParallelLinear(dim, dim, param_dtype=param_dtype,
                                        rngs=rngs)
        self.norm_q = RMSNorm(dim, eps=eps, param_dtype=param_dtype, rngs=rngs)
        self.norm_k = RMSNorm(dim, eps=eps, param_dtype=param_dtype, rngs=rngs)
        self.attn = LocalAttention(num_heads, self.head_dim,
                                   supported_backends=("FLASH_ATTN",
                                                       "TORCH_SDPA"))

    def _qkv(self, x: Array, context: Array):
        b = x.shape[0]
        n, d = self.num_heads, self.head_dim
        q = self.norm_q(self.to_q(x)).reshape(b, -1, n, d)
        k = self.norm_k(self.to_k(context)).reshape(b, -1, n, d)
        v = self.to_v(context).reshape(b, -1, n, d)
        return q, k, v

    def __call__(self, x: Array, context: Array) -> Array:
        q, k, v = self._qkv(x, context)
        out = self.attn(q, k, v)
        out = out.reshape(*out.shape[:2], -1)
        return self.to_out(out)


class WanI2VCrossAttention(WanT2VCrossAttention):
    """I2V cross-attention with 257 CLIP image tokens (wanvideo.py:239-290)."""

    NUM_IMAGE_TOKENS = 257

    def __init__(self, dim: int, num_heads: int, eps: float = 1e-6, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        super().__init__(dim, num_heads, eps, param_dtype=param_dtype,
                         rngs=rngs)
        self.add_k_proj = ColumnParallelLinear(dim, dim,
                                               param_dtype=param_dtype,
                                               rngs=rngs)
        self.add_v_proj = ColumnParallelLinear(dim, dim,
                                               param_dtype=param_dtype,
                                               rngs=rngs)
        self.norm_added_k = RMSNorm(dim, eps=eps, param_dtype=param_dtype,
                                    rngs=rngs)

    def __call__(self, x: Array, context: Array) -> Array:
        nimg = self.NUM_IMAGE_TOKENS
        context_img = context[:, :nimg]
        context_txt = context[:, nimg:]
        b = x.shape[0]
        n, d = self.num_heads, self.head_dim
        q, k, v = self._qkv(x, context_txt)
        k_img = self.norm_added_k(self.add_k_proj(context_img)).reshape(
            b, -1, n, d)
        v_img = self.add_v_proj(context_img).reshape(b, -1, n, d)
        img_out = self.attn(q, k_img, v_img)
        txt_out = self.attn(q, k, v)
        out = (txt_out + img_out).reshape(b, -1, n * d)
        return self.to_out(out)


class WanTransformerBlock(nnx.Module):
    """AdaLN DiT block: self-attn + cross-attn + FFN (wanvideo.py:291-456)."""

    def __init__(self, dim: int, ffn_dim: int, num_heads: int,
                 qk_norm: str = "rms_norm_across_heads", eps: float = 1e-6,
                 added_kv_proj_dim: int | None = None, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        self.dim = dim
        self.num_heads = num_heads
        head_dim = dim // num_heads

        self.norm1 = FP32LayerNorm(dim, eps, elementwise_affine=False,
                                   param_dtype=param_dtype, rngs=rngs)
        self.to_q = ColumnParallelLinear(dim, dim, param_dtype=param_dtype,
                                         rngs=rngs)
        self.to_k = ColumnParallelLinear(dim, dim, param_dtype=param_dtype,
                                         rngs=rngs)
        self.to_v = ColumnParallelLinear(dim, dim, param_dtype=param_dtype,
                                         rngs=rngs)
        self.to_out = RowParallelLinear(dim, dim, param_dtype=param_dtype,
                                        rngs=rngs)
        if qk_norm == "rms_norm":
            self.norm_q = RMSNorm(head_dim, eps=eps, param_dtype=param_dtype,
                                  rngs=rngs)
            self.norm_k = RMSNorm(head_dim, eps=eps, param_dtype=param_dtype,
                                  rngs=rngs)
        elif qk_norm == "rms_norm_across_heads":
            self.norm_q = RMSNorm(dim, eps=eps, param_dtype=param_dtype,
                                  rngs=rngs)
            self.norm_k = RMSNorm(dim, eps=eps, param_dtype=param_dtype,
                                  rngs=rngs)
        else:
            raise ValueError(f"Unsupported qk_norm: {qk_norm}")
        self.attn1 = DistributedAttention(num_heads, head_dim)

        self.self_attn_residual_norm = ScaleResidualLayerNormScaleShift(
            dim, norm_type="layer", eps=eps, elementwise_affine=True,
            param_dtype=param_dtype, rngs=rngs)
        cross_cls = (WanI2VCrossAttention
                     if added_kv_proj_dim is not None else WanT2VCrossAttention)
        self.attn2 = cross_cls(dim, num_heads, eps=eps,
                               param_dtype=param_dtype, rngs=rngs)
        self.cross_attn_residual_norm = ScaleResidualLayerNormScaleShift(
            dim, norm_type="layer", eps=eps, elementwise_affine=False,
            param_dtype=param_dtype, rngs=rngs)
        self.ffn = MLP(dim, ffn_dim, act_type="gelu_pytorch_tanh",
                       param_dtype=param_dtype, rngs=rngs)
        self.mlp_residual = ScaleResidual()
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (1, 6, dim), jnp.float32) /
            dim**0.5)

    def _gate_compress(self, norm_hidden: Array) -> Array | None:
        return None

    def __call__(self, hidden_states: Array, encoder_hidden_states: Array,
                 temb: Array, freqs_cis: tuple[Array, Array],
                 kv_valid: int | None = None,
                 grid: tuple[int, int, int] | None = None,
                 pre_tiled: bool = False) -> Array:
        orig_dtype = hidden_states.dtype
        b = hidden_states.shape[0]
        n, d = self.num_heads, self.dim // self.num_heads

        if temb.ndim == 4:
            # [B, S, 6, C] per-token modulation (Wan2.2 TI2V,
            # wanvideo.py:388-399).
            e = self.scale_shift_table.value[None] + temb.astype(jnp.float32)
            mods = [e[:, :, i] for i in range(6)]  # each [B, S, C]
        else:
            # [B, 6, C] global modulation.
            e = self.scale_shift_table.value + temb.astype(jnp.float32)
            mods = [e[:, i:i + 1] for i in range(6)]  # each [B, 1, C]
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = mods

        # 1. Self-attention.
        norm_hidden = self.norm1._norm_f32(hidden_states)
        norm_hidden = (norm_hidden * (1.0 + scale_msa) + shift_msa).astype(
            orig_dtype)
        q = self.norm_q(self.to_q(norm_hidden)).reshape(b, -1, n, d)
        k = self.norm_k(self.to_k(norm_hidden)).reshape(b, -1, n, d)
        v = self.to_v(norm_hidden).reshape(b, -1, n, d)
        gate = self._gate_compress(norm_hidden)
        attn_out = self.attn1(q, k, v, freqs_cis=freqs_cis, kv_valid=kv_valid,
                              grid=grid, gate=gate, pre_tiled=pre_tiled)
        attn_out = self.to_out(attn_out.reshape(b, -1, self.dim))

        zero = jnp.zeros((), jnp.float32)
        norm_hidden, hidden_states = self.self_attn_residual_norm(
            hidden_states, attn_out, gate_msa, zero, zero)

        # 2. Cross-attention (gate = 1).
        attn_out = self.attn2(norm_hidden, encoder_hidden_states)
        one = jnp.ones((), jnp.float32)
        norm_hidden, hidden_states = self.cross_attn_residual_norm(
            hidden_states, attn_out, one, c_shift, c_scale)

        # 3. Feed-forward.
        ff = self.ffn(norm_hidden)
        hidden_states = self.mlp_residual(hidden_states, ff, c_gate)
        return hidden_states.astype(orig_dtype)


class WanTransformerBlockVSA(WanTransformerBlock):
    """VSA block variant: adds the gate_compress projection feeding the
    compression-branch gate (reference WanTransformerBlock_VSA,
    wanvideo.py:456-615)."""

    def __init__(self, dim: int, ffn_dim: int, num_heads: int,
                 qk_norm: str = "rms_norm_across_heads", eps: float = 1e-6,
                 added_kv_proj_dim: int | None = None, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        super().__init__(dim, ffn_dim, num_heads, qk_norm, eps,
                         added_kv_proj_dim, param_dtype=param_dtype,
                         rngs=rngs)
        self.to_gate_compress = Linear(dim, dim, param_dtype=param_dtype,
                                       rngs=rngs)

    def _gate_compress(self, norm_hidden: Array) -> Array:
        b = norm_hidden.shape[0]
        n, d = self.num_heads, self.dim // self.num_heads
        return self.to_gate_compress(norm_hidden).reshape(b, -1, n, d)


class WanTransformer3DModel(nnx.Module):
    """Top-level Wan DiT (wanvideo.py:616-809)."""

    def __init__(self, config: WanArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        inner_dim = config.num_attention_heads * config.attention_head_dim
        self.inner_dim = inner_dim
        self.patch_embedding = PatchEmbed3D(config.in_channels, inner_dim,
                                            config.patch_size,
                                            param_dtype=param_dtype,
                                            rngs=rngs)
        self.condition_embedder = WanTimeTextImageEmbedding(
            inner_dim, config.freq_dim, config.text_dim, config.image_dim,
            r_embedder=getattr(config, "r_embedder", False),
            r_embedder_fusion=getattr(config, "r_embedder_fusion",
                                      "additive"),
            r_embedder_gate_value=getattr(config, "r_embedder_gate_value",
                                          0.25),
            r_embedder_deltatime_type=getattr(config,
                                              "r_embedder_deltatime_type",
                                              "r"),
            param_dtype=param_dtype, rngs=rngs)
        from fastvideo_tpu.attention.selector import resolve_backend_name

        block_cls = WanTransformerBlock
        try:
            if resolve_backend_name() == "VIDEO_SPARSE_ATTN":
                block_cls = WanTransformerBlockVSA
        except ValueError:
            pass
        # VSA runs the whole transformer in tile-major token order: the
        # tile permutation is applied ONCE after patch-embed (rope tables
        # and per-token modulation are permuted with it — both are
        # per-token, so they commute with a static permutation) and
        # inverted ONCE before the output head, instead of scattering /
        # gathering q/k/v/gate inside every block (which erased the sparse
        # kernel's win on TPU).
        self.vsa_tiled_order = block_cls is WanTransformerBlockVSA
        self.blocks = nnx.List([
            block_cls(inner_dim, config.ffn_dim,
                                config.num_attention_heads, config.qk_norm,
                                config.eps, config.added_kv_proj_dim,
                                param_dtype=param_dtype, rngs=rngs)
            for _ in range(config.num_layers)
        ])
        self.norm_out = LayerNormScaleShift(inner_dim, norm_type="layer",
                                            eps=config.eps,
                                            elementwise_affine=False,
                                            param_dtype=param_dtype, rngs=rngs)
        self.proj_out = Linear(inner_dim,
                               config.out_channels *
                               math.prod(config.patch_size),
                               param_dtype=param_dtype, rngs=rngs)
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (1, 2, inner_dim), jnp.float32) /
            inner_dim**0.5)
        # set by the trainer; wraps each block in jax.checkpoint (the remat
        # analog of the reference's activation checkpointing,
        # training/activation_checkpoint.py:86)
        self.gradient_checkpointing = False
        # remat policy when gradient_checkpointing is on: None = save
        # nothing (recompute the whole block); a jax.checkpoint_policies
        # policy (e.g. dots_with_no_batch_dims_saveable) keeps matmul
        # outputs and recomputes only the cheap elementwise chains —
        # trades HBM back for bwd FLOPs (trainer sets this from
        # TrainingArgs.selective_checkpointing="ops")
        self.gradient_checkpointing_policy = None
        # lax.scan over stacked block params: one compiled block instead of
        # num_layers inlined copies (TPU-idiomatic; cuts XLA compile time
        # roughly by the layer count — measured ~25 min -> minutes for the
        # 30-layer 1.3B VSA step on v5e). Default ON; set False to debug
        # per-layer or for architectures whose blocks diverge.
        self.scan_layers = True

    def _scan_blocks(self, x, encoder_hidden_states, timestep_proj,
                     freqs_cis, kv_valid, grid, pre_tiled=False):
        from flax import nnx as _nnx

        graphdef, state0 = _nnx.split(self.blocks[0])
        states = [_nnx.split(blk)[1] for blk in self.blocks]
        stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *states)

        def body(carry, layer_state):
            blk = _nnx.merge(graphdef, layer_state)
            fn = (jax.checkpoint(lambda x_: blk(
                x_, encoder_hidden_states, timestep_proj, freqs_cis,
                kv_valid, grid=grid, pre_tiled=pre_tiled),
                policy=self.gradient_checkpointing_policy)
                if self.gradient_checkpointing else
                (lambda x_: blk(x_, encoder_hidden_states, timestep_proj,
                                freqs_cis, kv_valid, grid=grid,
                                pre_tiled=pre_tiled)))
            return fn(carry), None

        x, _ = jax.lax.scan(body, x, stacked)
        return x

    def __call__(
        self,
        hidden_states: Array,
        encoder_hidden_states: Array,
        timestep: Array,
        encoder_hidden_states_image: Array | None = None,
        start_frame: int = 0,
        r_timestep: Array | None = None,
    ) -> Array:
        """hidden_states [B, C, T, H, W]; timestep [B] or [B, S] fp32.

        ``r_timestep`` [B]: AnyFlow flow-map target time — only consumed
        when the arch config enables ``r_embedder``."""
        cfg = self.config
        b, c, t, h, w = hidden_states.shape
        pt, ph, pw = cfg.patch_size
        gt, gh, gw = t // pt, h // ph, w // pw
        head_dim = cfg.attention_head_dim

        cos, sin = get_rotary_pos_embed_wan((gt, gh, gw), head_dim,
                                            cfg.rope_theta,
                                            start_frame=start_frame)

        x = self.patch_embedding(hidden_states)  # [B, S, C]
        pre_tiled = self.vsa_tiled_order
        if pre_tiled:
            from fastvideo_tpu.attention.backends.vsa import resolve_vsa_tile
            from fastvideo_tpu.ops.vsa import (tile_tokens,
                                               tile_tokens_exact,
                                               untile_tokens,
                                               untile_tokens_exact)

            vsa_tile, vsa_exact = resolve_vsa_tile((gt, gh, gw))
            _tile = tile_tokens_exact if vsa_exact else tile_tokens
            _untile = untile_tokens_exact if vsa_exact else untile_tokens

            # hoisted VSA permutation: tokens + rope tables enter tile-major
            # order here and leave it just before the output projection.
            x = _tile(x, (gt, gh, gw), vsa_tile)
            cos = _tile(cos[None], (gt, gh, gw), vsa_tile)[0]
            sin = _tile(sin[None], (gt, gh, gw), vsa_tile)[0]
        x, orig_seq_len = shard_seq(x)
        if x.shape[1] != cos.shape[0]:
            pad = x.shape[1] - cos.shape[0]
            cos = jnp.pad(cos, ((0, pad), (0, 0)), constant_values=1.0)
            sin = jnp.pad(sin, ((0, pad), (0, 0)))
        kv_valid = orig_seq_len if x.shape[1] != orig_seq_len else None
        if pre_tiled:
            kv_valid = None  # per-tile masking via block_sizes instead

        ts_seq_len = timestep.shape[1] if timestep.ndim == 2 else None
        if ts_seq_len is not None:
            timestep = timestep.reshape(-1)

        temb, timestep_proj, encoder_hidden_states, enc_image = (
            self.condition_embedder(timestep, encoder_hidden_states,
                                    encoder_hidden_states_image, ts_seq_len,
                                    r_timestep=r_timestep))
        if ts_seq_len is not None:
            # [B, S, 6, C]
            timestep_proj = timestep_proj.reshape(
                *timestep_proj.shape[:2], 6, -1)
            if pre_tiled:
                # per-token modulation follows the token permutation
                timestep_proj = _tile(timestep_proj, (gt, gh, gw), vsa_tile)
                temb = _tile(temb, (gt, gh, gw), vsa_tile)
            from fastvideo_tpu.parallel import pad_tokens_to

            # per-token modulation follows the sp zero-padding of x
            timestep_proj = pad_tokens_to(timestep_proj, x.shape[1])
            temb = pad_tokens_to(temb, x.shape[1])
        else:
            # [B, 6, C]
            timestep_proj = timestep_proj.reshape(timestep_proj.shape[0], 6,
                                                  -1)
        if enc_image is not None:
            encoder_hidden_states = jnp.concatenate(
                [enc_image, encoder_hidden_states], axis=1)
        encoder_hidden_states = encoder_hidden_states.astype(x.dtype)

        freqs_cis = (cos, sin)
        if self.scan_layers:
            x = self._scan_blocks(x, encoder_hidden_states, timestep_proj,
                                  freqs_cis, kv_valid, (gt, gh, gw),
                                  pre_tiled)
        else:
            for block in self.blocks:
                if self.gradient_checkpointing:
                    def run_block(x_, ehs_, tp_, blk=block):
                        return blk(x_, ehs_, tp_, freqs_cis, kv_valid,
                                   grid=(gt, gh, gw), pre_tiled=pre_tiled)

                    x = jax.checkpoint(
                        run_block,
                        policy=self.gradient_checkpointing_policy)(
                            x, encoder_hidden_states, timestep_proj)
                else:
                    x = block(x, encoder_hidden_states, timestep_proj,
                              freqs_cis, kv_valid, grid=(gt, gh, gw),
                              pre_tiled=pre_tiled)

        # Output head (wanvideo.py:781-806).
        if temb.ndim == 3:
            # [B, S, C] per-token
            e = (self.scale_shift_table.value[None] +
                 temb.astype(jnp.float32)[:, :, None])
            shift, scale = e[:, :, 0], e[:, :, 1]
        else:
            e = self.scale_shift_table.value + temb.astype(
                jnp.float32)[:, None]
            shift, scale = e[:, 0:1], e[:, 1:2]
        x = self.norm_out(x, shift, scale)
        x = unshard_seq(x, orig_seq_len)
        if pre_tiled:
            # leave tile-major order once, before the (cheaper) head
            # projection over the true token count.
            x = _untile(x, (gt, gh, gw), vsa_tile)
        x = self.proj_out(x)
        return unpatchify(x, gt, gh, gw, cfg.patch_size, cfg.out_channels)


# Entry point for the model registry (mirrors reference EntryClass).
EntryClass = WanTransformer3DModel
