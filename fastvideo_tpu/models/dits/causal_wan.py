"""Causal Wan: block-autoregressive DiT with rolling KV caches (streaming).

Behavioral reference: /root/reference/fastvideo/models/dits/causal_wanvideo.py
(:44-860) and the self-forcing denoising stage
(pipelines/stages/causal_denoising.py:437-620).

TPU redesign of the cache (causal_wanvideo.py:149-207 mutates dict caches
with data-dependent rolls — jit-hostile):

* fixed-size buffers: ``sink`` [B, sink_tokens, H, D] (written while the
  stream is inside the sink region, then frozen) and a rolling ``window``
  [B, W, H, D] that shifts left by the (static) block size and appends at
  the end — all static slices, no dynamic shapes;
* invalid window slots (before the buffer fills) sit at the FRONT and are
  masked by a traced valid-count;
* keys are cached post-RoPE at absolute positions ("absolute" rope policy);
  rope tables for the whole rollout are precomputed host-side and sliced
  per block outside jit, so block steps never recompile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
from fastvideo_tpu.layers.norm import FP32LayerNorm
from fastvideo_tpu.layers.rotary import apply_rotary_emb, get_rotary_pos_embed_wan
from fastvideo_tpu.models.dits.wan import (WanTransformer3DModel,
                                           WanTransformerBlock)

Array = jax.Array

NEG_INF = float(jnp.finfo(jnp.float32).min)


def init_layer_cache(batch_size: int, window_tokens: int, sink_tokens: int,
                     num_heads: int, head_dim: int,
                     dtype=jnp.bfloat16) -> dict:
    """``window_tokens`` is the TOTAL attention budget (reference
    causal_denoising.py:365-377 allocates one local_attn_size*frame_seqlen
    buffer); the sink lives INSIDE it, so the rolling part holds
    window_tokens - sink_tokens."""
    z = lambda n: jnp.zeros((batch_size, n, num_heads, head_dim), dtype)  # noqa: E731
    roll = max(window_tokens - sink_tokens, 0)
    return {
        "k": z(roll), "v": z(roll),
        "sink_k": z(sink_tokens), "sink_v": z(sink_tokens),
        "valid": jnp.zeros((), jnp.int32),
        "global_end": jnp.zeros((), jnp.int32),
    }


def _append_rolling(buf: Array, new: Array) -> Array:
    """Shift left by len(new), append new at the end (static slices)."""
    n = new.shape[1]
    if n >= buf.shape[1]:
        return new[:, -buf.shape[1]:]
    return jnp.concatenate([buf[:, n:], new.astype(buf.dtype)], axis=1)


def cached_self_attention(q: Array, k: Array, v: Array, cache: dict,
                          scale: float) -> tuple[Array, dict]:
    """q/k/v [B, n, H, D] (already roped). Returns (out, new cache)."""
    n = q.shape[1]
    window = cache["k"].shape[1]
    sink_cap = cache["sink_k"].shape[1]
    global_end = cache["global_end"] + n

    if sink_cap > 0:
        # write the part of the new tokens whose ABSOLUTE position falls
        # inside the sink region: sink slot j takes new token (j - start)
        # when 0 <= j - start < n. An exact gather+select — robust to
        # blocks larger than the sink and to partial overlaps (a plain
        # dynamic_update_slice clamps its offset and would shift writes).
        start = cache["global_end"]
        src_idx = jnp.arange(sink_cap) - start
        in_range = (src_idx >= 0) & (src_idx < n)
        gather = jnp.clip(src_idx, 0, n - 1)
        sink_k = jnp.where(in_range[None, :, None, None],
                           jnp.take(k, gather, axis=1).astype(
                               cache["sink_k"].dtype), cache["sink_k"])
        sink_v = jnp.where(in_range[None, :, None, None],
                           jnp.take(v, gather, axis=1).astype(
                               cache["sink_v"].dtype), cache["sink_v"])
    else:
        sink_k, sink_v = cache["sink_k"], cache["sink_v"]

    new_k = _append_rolling(cache["k"], k)
    new_v = _append_rolling(cache["v"], v)
    valid = jnp.minimum(cache["valid"] + n, window)

    # masks: window slots [0, window-valid) are empty; sink slots beyond
    # min(global_end, sink_cap) are empty; window slots whose ABSOLUTE
    # position falls inside the sink region are masked too — those tokens
    # are attended via the frozen sink buffer, and counting both copies
    # double-weighted early frames (the reference keeps ONE
    # local_attn_size buffer with the sink frozen at its front, each
    # token present exactly once).
    win_pos = jnp.arange(window)
    win_ok = win_pos >= (window - valid)
    if sink_cap > 0:
        abs_pos = global_end - window + win_pos
        win_ok = win_ok & (abs_pos >= sink_cap)
        sink_ok = jnp.arange(sink_cap) < jnp.minimum(global_end, sink_cap)
        keys = jnp.concatenate([sink_k, new_k], axis=1)
        vals = jnp.concatenate([sink_v, new_v], axis=1)
        ok = jnp.concatenate([sink_ok, win_ok])
    else:
        keys, vals, ok = new_k, new_v, win_ok

    if keys.shape[1] >= 1024 and q.shape[-1] % 128 == 0:
        # Flash with a dynamic per-key validity mask: the dense bias path
        # materializes the [B, H, n, S_kv] score matrix — ~8 GB fp32 per
        # layer at 1.3B/480p streaming scale (n=4680, S_kv=37k), an instant
        # OOM on a 16 GB chip and pure HBM traffic even when it fits. The
        # mask VALUES are traced (cache-fill counters) but its shape is
        # static, so block steps never recompile.
        from fastvideo_tpu.ops.flash_attention import flash_attention_kv_mask
        out = flash_attention_kv_mask(q, keys.astype(q.dtype),
                                      vals.astype(q.dtype), ok, scale=scale)
    else:
        bias = jnp.where(ok, 0.0, NEG_INF)[None, None, None, :]
        out = jax.nn.dot_product_attention(q, keys.astype(q.dtype),
                                           vals.astype(q.dtype), bias=bias,
                                           scale=scale)
    new_cache = dict(cache)
    new_cache.update(k=new_k, v=new_v, valid=valid, global_end=global_end,
                     sink_k=sink_k, sink_v=sink_v)
    return out, new_cache


class CausalWanTransformerBlock(WanTransformerBlock):
    """Wan block with cached causal self-attn + cached cross-attn context."""

    def causal_forward(self, hidden_states: Array,
                       encoder_hidden_states: Array, temb: Array,
                       freqs_cis, kv_cache: dict,
                       crossattn_cache: dict | None):
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

        # cross-attention with cached context k/v
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


def _masked_block_forward(block: "CausalWanTransformerBlock",
                          hidden_states: Array,
                          encoder_hidden_states: Array, temb: Array,
                          freqs_cis, chunk_tokens: int,
                          tf_clean_len: int) -> Array:
    """Full-sequence block forward under a structural flash mask.

    ``temb`` is per-token [B, S, 6, C] (inhomogeneous timesteps). The
    blockwise-causal / teacher-forcing mask is computed inside the flash
    kernel from static chunk geometry (no [S, S] bias ever materializes —
    the reference gets the same from flex-attention block masks,
    causal_wanvideo.py:436-565).
    """
    from fastvideo_tpu.ops.flash_attention import flash_attention

    orig_dtype = hidden_states.dtype
    b = hidden_states.shape[0]
    n, d = block.num_heads, block.dim // block.num_heads

    e = block.scale_shift_table.value[None] + temb.astype(jnp.float32)
    mods = [e[:, :, i] for i in range(6)]  # each [B, S, C]
    shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = mods

    norm_hidden = block.norm1._norm_f32(hidden_states)
    norm_hidden = (norm_hidden * (1.0 + scale_msa) + shift_msa).astype(
        orig_dtype)
    q = block.norm_q(block.to_q(norm_hidden)).reshape(b, -1, n, d)
    k = block.norm_k(block.to_k(norm_hidden)).reshape(b, -1, n, d)
    v = block.to_v(norm_hidden).reshape(b, -1, n, d)
    cos, sin = freqs_cis
    q = apply_rotary_emb(q, cos, sin)
    k = apply_rotary_emb(k, cos, sin)
    attn_out = flash_attention(q, k, v, scale=d**-0.5,
                               chunk_tokens=chunk_tokens,
                               tf_clean_len=tf_clean_len)
    attn_out = block.to_out(attn_out.reshape(b, -1, block.dim))

    zero = jnp.zeros((), jnp.float32)
    norm_hidden, hidden_states = block.self_attn_residual_norm(
        hidden_states, attn_out, gate_msa, zero, zero)

    attn_out = block.attn2(norm_hidden, encoder_hidden_states)
    one = jnp.ones((), jnp.float32)
    norm_hidden, hidden_states = block.cross_attn_residual_norm(
        hidden_states, attn_out, one, c_shift, c_scale)

    ff = block.ffn(norm_hidden)
    hidden_states = block.mlp_residual(hidden_states, ff, c_gate)
    return hidden_states.astype(orig_dtype)


class CausalWanTransformer3DModel(WanTransformer3DModel):
    """Block-autoregressive Wan (reference causal_wanvideo.py:369-860)."""

    block_cls = CausalWanTransformerBlock

    def __init__(self, config: WanArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        super().__init__(config, param_dtype=param_dtype, rngs=rngs)
        # rebuild blocks as causal blocks (same params/layout)
        rngs2 = nnx.Rngs(0)
        self.blocks = nnx.List([
            CausalWanTransformerBlock(
                self.inner_dim, config.ffn_dim, config.num_attention_heads,
                config.qk_norm, config.eps, config.added_kv_proj_dim,
                param_dtype=param_dtype, rngs=rngs2)
            for _ in range(config.num_layers)
        ])

    # -- caches ------------------------------------------------------------

    def init_caches(self, batch_size: int, frame_seqlen: int,
                    dtype=jnp.bfloat16) -> list[dict]:
        cfg = self.config
        if cfg.local_attn_size != -1:
            window = cfg.local_attn_size * frame_seqlen
        else:
            window = getattr(cfg, "sliding_window_num_frames", 21) * \
                frame_seqlen
        sink = cfg.sink_size * frame_seqlen
        return [
            init_layer_cache(batch_size, window, sink,
                             cfg.num_attention_heads,
                             cfg.attention_head_dim, dtype)
            for _ in range(cfg.num_layers)
        ]

    def init_crossattn_caches(self) -> list[dict]:
        return [{} for _ in range(self.config.num_layers)]

    def precompute_crossattn_caches(
            self, encoder_hidden_states: Array,
            dtype: jnp.dtype | None = None) -> list[dict]:
        """Per-layer text K/V, computed ONCE per prompt.

        The text context is constant across blocks and denoise steps, so
        the cross-attention projections need not rerun inside every
        forward_block call (reference caches them in its python-side
        crossattn_cache dicts, causal_wanvideo.py:388-414). Jit-friendly:
        returns concrete arrays that callers thread into ``forward_block``
        as the ``crossattn_caches`` pytree."""
        ctx = self.condition_embedder.text_embedder(encoder_hidden_states)
        if dtype is not None:
            ctx = ctx.astype(dtype)
        caches: list[dict] = []
        b = ctx.shape[0]
        for block in self.blocks:
            ca = block.attn2
            n, d = block.num_heads, block.dim // block.num_heads
            kx = ca.norm_k(ca.to_k(ctx)).reshape(b, -1, n, d)
            vx = ca.to_v(ctx).reshape(b, -1, n, d)
            caches.append({"k": kx, "v": vx})
        return caches

    # -- block forward -----------------------------------------------------

    def forward_block(self, hidden_states: Array,
                      encoder_hidden_states: Array, timestep: Array,
                      kv_caches: list[dict],
                      crossattn_caches: list[dict] | None = None,
                      start_frame: int = 0,
                      freqs_cis: tuple[Array, Array] | None = None):
        """One autoregressive block. hidden_states [B, C, Tb, H, W].

        Returns (pred [B, C, Tb, H, W], new kv_caches). Pass ``freqs_cis``
        (precomputed for this block's absolute positions) when calling under
        jit so per-block start offsets don't trigger recompiles.
        """
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

        temb, timestep_proj, ctx, _ = self.condition_embedder(
            timestep.reshape(-1), encoder_hidden_states, None, None)
        timestep_proj = timestep_proj.reshape(timestep_proj.shape[0], 6, -1)
        ctx = ctx.astype(x.dtype)

        new_caches = []
        for block, cache, ca_cache in zip(
                self.blocks, kv_caches,
                crossattn_caches or [None] * len(kv_caches), strict=True):
            x, cache = block.causal_forward(x, ctx, timestep_proj,
                                            (cos, sin), cache, ca_cache)
            new_caches.append(cache)

        e = self.scale_shift_table.value + temb.astype(jnp.float32)[:, None]
        shift, scale = e[:, 0:1], e[:, 1:2]
        x = self.norm_out(x, shift, scale)
        x = self.proj_out(x)
        from fastvideo_tpu.layers.embeddings import unpatchify

        return unpatchify(x, gt, gh, gw, cfg.patch_size,
                          cfg.out_channels), new_caches

    # -- full-sequence training forward -------------------------------------

    def train_forward(self, hidden_states: Array,
                      encoder_hidden_states: Array, timestep: Array,
                      clean_x: Array | None = None,
                      aug_t: Array | None = None) -> Array:
        """Blockwise-causal full-sequence forward for diffusion-forcing /
        teacher-forcing training (reference causal_wanvideo.py:684-830).

        hidden_states [B, C, T, H, W]; ``timestep`` [B, gt] per latent
        frame (inhomogeneous). With ``clean_x`` the sequence becomes
        ``[clean | noisy]`` under the teacher-forcing mask and only the
        noisy half's prediction is returned; ``aug_t`` [B, gt] optionally
        noise-augments the clean context timesteps (default zeros).
        """
        cfg = self.config
        b, c, t, h, w = hidden_states.shape
        pt, ph, pw = cfg.patch_size
        gt, gh, gw = t // pt, h // ph, w // pw
        fs = gh * gw
        seq_len = gt * fs
        if timestep.ndim != 2 or timestep.shape[1] != gt:
            raise ValueError(
                f"timestep must be [B, {gt}] per latent frame, got "
                f"{timestep.shape}")
        chunk_tokens = cfg.num_frames_per_block * fs

        cos, sin = get_rotary_pos_embed_wan((gt, gh, gw),
                                            cfg.attention_head_dim,
                                            cfg.rope_theta)
        x = self.patch_embedding(hidden_states)  # [B, S, C]

        ts_tok = jnp.repeat(timestep.astype(jnp.float32), fs, axis=1)
        temb, timestep_proj, ctx, _ = self.condition_embedder(
            ts_tok.reshape(-1), encoder_hidden_states, None, seq_len)
        timestep_proj = timestep_proj.reshape(b, seq_len, 6, -1)
        ctx = ctx.astype(x.dtype)

        tf_clean_len = 0
        if clean_x is not None:
            tf_clean_len = seq_len
            clean_tokens = self.patch_embedding(clean_x)
            if aug_t is None:
                aug_t = jnp.zeros_like(timestep)
            aug_tok = jnp.repeat(aug_t.astype(jnp.float32), fs, axis=1)
            _, proj_clean, _, _ = self.condition_embedder(
                aug_tok.reshape(-1), encoder_hidden_states, None, seq_len)
            proj_clean = proj_clean.reshape(b, seq_len, 6, -1)
            # Clean frame i and noisy frame i share a rope position
            # (causal_wanvideo.py:774-786).
            x = jnp.concatenate([clean_tokens, x], axis=1)
            timestep_proj = jnp.concatenate([proj_clean, timestep_proj],
                                            axis=1)
            cos = jnp.concatenate([cos, cos], axis=0)
            sin = jnp.concatenate([sin, sin], axis=0)

        freqs_cis = (cos, sin)
        from flax import nnx as _nnx

        graphdef, _ = _nnx.split(self.blocks[0])
        states = [_nnx.split(blk)[1] for blk in self.blocks]
        stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *states)

        def body(carry, layer_state):
            blk = _nnx.merge(graphdef, layer_state)

            def run(x_):
                return _masked_block_forward(blk, x_, ctx, timestep_proj,
                                             freqs_cis, chunk_tokens,
                                             tf_clean_len)

            fn = jax.checkpoint(run) if self.gradient_checkpointing else run
            return fn(carry), None

        x, _ = jax.lax.scan(body, x, stacked)

        if clean_x is not None:
            x = x[:, seq_len:]

        # per-token output modulation from the NOISY timesteps
        e = (self.scale_shift_table.value[None] +
             temb.reshape(b, seq_len, -1).astype(jnp.float32)[:, :, None])
        shift, scale = e[:, :, 0], e[:, :, 1]
        x = self.norm_out(x, shift, scale)
        x = self.proj_out(x)
        from fastvideo_tpu.layers.embeddings import unpatchify

        return unpatchify(x, gt, gh, gw, cfg.patch_size, cfg.out_channels)


EntryClass = CausalWanTransformer3DModel
