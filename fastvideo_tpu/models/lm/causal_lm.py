"""KV-cache autoregressive decoding over the repo's Llama-family trunks.

Reference behavior: HF ``LlamaForCausalLM.generate`` (greedy / sampled)
as used by VideoScore2's Qwen2.5-VL judge
(/root/reference/fastvideo/eval/metrics/videoscore2/metric.py:120-180
drives ``model.generate(..., output_scores=True)``).

TPU design: decode runs as ONE jitted program per (batch, prompt-pad,
max-new) bucket — ``prefill`` computes the prompt pass and fills fixed
[B, max_len, kv_heads, head_dim] cache buffers, then a ``lax.scan``
generates tokens with single-position attention against the cache. No
per-token python dispatch. Inputs may be multimodal: ``inputs_embeds``
lets a vision tower splice image embeddings into the prompt (the
Qwen2.5-VL pattern).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.models.encoders.llama import (LlamaEncoderModel,
                                                 _apply_rope_neox,
                                                 _rope_tables)

Array = jax.Array


@dataclasses.dataclass
class GenerationResult:
    tokens: Array        # [B, max_new] generated token ids
    num_tokens: Array    # [B] tokens before EOS (inclusive)
    scores: Array        # [B, max_new, vocab] per-step logits


class CausalLM(nnx.Module):
    """LM head over a :class:`LlamaEncoderModel`-family trunk."""

    def __init__(self, trunk: LlamaEncoderModel, *,
                 tie_word_embeddings: bool = False,
                 param_dtype=jnp.float32, rngs: nnx.Rngs | None = None):
        from fastvideo_tpu.layers.linear import ColumnParallelLinear

        rngs = rngs or nnx.Rngs(0)
        self.trunk = trunk
        self.tie = bool(tie_word_embeddings)
        cfg = trunk.config
        if not self.tie:
            self.lm_head = ColumnParallelLinear(
                cfg.hidden_size, cfg.vocab_size, bias=False,
                param_dtype=param_dtype, rngs=rngs)

    # -- shared pieces -------------------------------------------------------

    def _head_dim(self) -> int:
        cfg = self.trunk.config
        return (getattr(cfg, "head_dim", None)
                or cfg.hidden_size // cfg.num_attention_heads)

    def _logits(self, hidden: Array) -> Array:
        if self.tie:
            w = self.trunk.embed_tokens.weight.value
            return hidden.astype(jnp.float32) @ w.astype(jnp.float32).T
        return self.lm_head(hidden).astype(jnp.float32)

    def _layer_forward(self, layer, x: Array, cos: Array, sin: Array,
                       caches: dict, layer_idx: int, pos: Array,
                       mask_bias: Array):
        """One decoder layer with explicit KV caches.

        ``caches['k']/['v']``: [L, B, max_len, n_kv, d]; new K/V written
        at ``pos`` (scalar when decoding one token, 0 for prefill)."""
        attn = layer.self_attn
        xa = layer.input_layernorm(x)
        b, s, _ = xa.shape
        q = attn.q_proj(xa).reshape(b, s, attn.n_heads, attn.head_dim)
        k = attn.k_proj(xa).reshape(b, s, attn.n_kv, attn.head_dim)
        v = attn.v_proj(xa).reshape(b, s, attn.n_kv, attn.head_dim)
        if attn.q_norm is not None:
            q = attn.q_norm(q).astype(xa.dtype)
            k = attn.k_norm(k).astype(xa.dtype)
        q = _apply_rope_neox(q, cos, sin)
        k = _apply_rope_neox(k, cos, sin)
        ck = jax.lax.dynamic_update_slice_in_dim(
            caches["k"][layer_idx], k.astype(caches["k"].dtype), pos,
            axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(
            caches["v"][layer_idx], v.astype(caches["v"].dtype), pos,
            axis=1)
        caches = {"k": caches["k"].at[layer_idx].set(ck),
                  "v": caches["v"].at[layer_idx].set(cv)}
        kk, vv = ck.astype(q.dtype), cv.astype(q.dtype)
        if attn.n_kv != attn.n_heads:
            rep = attn.n_heads // attn.n_kv
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
        out = jax.nn.dot_product_attention(q, kk, vv, bias=mask_bias)
        x = x + attn.o_proj(out.reshape(b, s, -1))
        return x + layer.mlp(layer.post_attention_layernorm(x)), caches

    # -- prefill + decode ----------------------------------------------------

    def init_caches(self, batch: int, max_len: int,
                    dtype=jnp.float32) -> dict:
        cfg = self.trunk.config
        n_layers = len(self.trunk.layers)
        shape = (n_layers, batch, max_len, cfg.num_key_value_heads,
                 self._head_dim())
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}

    def prefill(self, caches: dict, input_ids: Array | None,
                attention_mask: Array,
                inputs_embeds: Array | None = None):
        """Prompt pass. Returns (last-position logits [B, V], caches).

        ``attention_mask`` [B, S] marks valid prompt tokens (right
        padding). ``inputs_embeds`` overrides token embedding for
        multimodal prompts."""
        x = (inputs_embeds if inputs_embeds is not None
             else self.trunk.embed_tokens(input_ids))
        b, s, _ = x.shape
        max_len = caches["k"].shape[2]
        cos, sin = _rope_tables(s, self._head_dim(),
                                self.trunk.config.rope_theta)
        causal = jnp.tril(jnp.ones((s, s), bool))
        ok = causal[None, None] & (attention_mask[:, None, None, :] > 0)
        # attend over the cache layout: prompt occupies [0, s)
        pad = jnp.zeros((b, 1, s, max_len - s), bool)
        bias = jnp.where(
            jnp.concatenate([ok, pad], axis=-1), 0.0,
            jnp.finfo(jnp.float32).min)
        for i, layer in enumerate(self.trunk.layers):
            x, caches = self._layer_forward(layer, x, cos, sin, caches, i,
                                            jnp.int32(0), bias)
        final = self.trunk.norm(x)
        # logits at each row's last valid position
        last = jnp.sum(attention_mask > 0, axis=-1) - 1
        hidden_last = jnp.take_along_axis(
            final, last[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return self._logits(hidden_last), caches

    def decode_step(self, caches: dict, token: Array, pos: Array,
                    prompt_len: Array):
        """One token step. token [B], pos scalar (cache slot), returns
        (logits [B, V], caches)."""
        x = self.trunk.embed_tokens(token[:, None])
        head_dim = self._head_dim()
        theta = self.trunk.config.rope_theta
        max_pos = caches["k"].shape[2]
        cos_t, sin_t = _rope_tables(max_pos, head_dim, theta)
        cos = jax.lax.dynamic_slice_in_dim(cos_t, pos, 1, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(sin_t, pos, 1, axis=0)
        # valid cache slots: [0, prompt_len) per row plus generated slots
        # [prompt_pad, pos]; everything else is masked out
        slots = jnp.arange(max_pos)
        prompt_pad = caches.get("_prompt_pad", prompt_len.max())
        valid = (slots[None, :] < prompt_len[:, None]) | (
            (slots[None, :] >= prompt_pad) & (slots[None, :] <= pos))
        bias = jnp.where(valid[:, None, None, :], 0.0,
                         jnp.finfo(jnp.float32).min)
        extras = {k: v for k, v in caches.items() if k not in ("k", "v")}
        caches = {"k": caches["k"], "v": caches["v"]}
        for i, layer in enumerate(self.trunk.layers):
            x, caches = self._layer_forward(layer, x, cos, sin, caches, i,
                                            pos, bias)
        caches.update(extras)
        final = self.trunk.norm(x)
        return self._logits(final[:, 0]), caches

    def generate(self, input_ids: Array, attention_mask: Array,
                 max_new_tokens: int, eos_token_id: int | None = None,
                 temperature: float = 0.0, key: Array | None = None,
                 inputs_embeds: Array | None = None) -> GenerationResult:
        """Greedy (temperature 0) or sampled generation.

        One python-level prefill + one ``lax.scan`` over decode steps;
        wrap in jit at the call site for repeated shapes. Rows shorter
        than the padded prompt get a rope-position gap at the pad (the
        usual right-padding caveat) — batch equal-length prompts, or
        run B=1, for exact HF-equivalent positions."""
        b, s = attention_mask.shape
        max_len = s + max_new_tokens
        caches = self.init_caches(b, max_len)
        logits, caches = self.prefill(caches, input_ids, attention_mask,
                                      inputs_embeds)
        caches["_prompt_pad"] = jnp.int32(s)
        prompt_len = jnp.sum(attention_mask > 0, axis=-1).astype(jnp.int32)
        if key is None:
            key = jax.random.PRNGKey(0)

        def pick(logits, k):
            if temperature and temperature > 0:
                return jax.random.categorical(k, logits / temperature,
                                              axis=-1)
            return jnp.argmax(logits, axis=-1)

        def step(carry, i):
            caches, logits, done, key = carry
            key, sub = jax.random.split(key)
            token = pick(logits, sub).astype(jnp.int32)
            if eos_token_id is not None:
                token = jnp.where(done, jnp.int32(eos_token_id), token)
                done = done | (token == eos_token_id)
            new_logits, caches = self.decode_step(
                caches, token, jnp.int32(s) + i, prompt_len)
            return (caches, new_logits, done, key), (token, logits)

        done0 = jnp.zeros((b,), bool)
        (_, _, done, _), (tokens, scores) = jax.lax.scan(
            step, (caches, logits, done0, key),
            jnp.arange(max_new_tokens))
        tokens = jnp.moveaxis(tokens, 0, 1)      # [B, max_new]
        scores = jnp.moveaxis(scores, 0, 1)      # [B, max_new, V]
        if eos_token_id is not None:
            hit = tokens == eos_token_id
            first_eos = jnp.where(hit.any(axis=1),
                                  jnp.argmax(hit, axis=1) + 1,
                                  max_new_tokens)
        else:
            first_eos = jnp.full((b,), max_new_tokens)
        return GenerationResult(tokens=tokens, num_tokens=first_eos,
                                scores=scores)
