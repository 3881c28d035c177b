"""Stable Audio Open conditioner (T5 prompt + duration NumberConditioners).

Behavioral reference:
/root/reference/fastvideo/models/encoders/stable_audio_conditioner.py
(:20-214). TPU deviations: the T5 sub-encoder's weights + tokenizer live
INSIDE the conditioner component directory (zero-egress — the reference
pulls `t5-base` from the HF hub at init), and everything is functional
JAX/nnx.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.models.encoders.t5 import T5EncoderModel

Array = jax.Array


@dataclasses.dataclass
class StableAudioConditionerArchConfig:
    """SA-Open-1.0 defaults (reference
    configs/models/encoders/stable_audio_conditioner.py)."""

    cond_dim: int = 768
    number_embed_dim: int = 256
    cross_attention_cond_ids: tuple[str, ...] = ("prompt", "seconds_start",
                                                 "seconds_total")
    global_cond_ids: tuple[str, ...] = ("seconds_start", "seconds_total")
    min_val: float = 0.0
    max_val: float = 512.0
    t5_max_length: int = 128
    # nested T5 dims (t5-base for SA-1.0)
    t5: dict = dataclasses.field(default_factory=lambda: dict(
        vocab_size=32128, d_model=768, d_kv=64, d_ff=3072, num_layers=12,
        num_heads=12, feed_forward_proj="relu"))

    def update_from_hf(self, hf: dict) -> None:
        for k, v in hf.items():
            if hasattr(self, k) and not k.startswith("_"):
                setattr(self, k, tuple(v) if isinstance(v, list) and
                        k.endswith("_ids") else v)


class LearnedPositionalEmbedding(nnx.Module):
    """x [B] -> [B, dim+1]: (x, sin(2pi f x), cos(2pi f x)) with learned f
    (reference :20-31)."""

    def __init__(self, dim: int, *, param_dtype, rngs: nnx.Rngs):
        assert dim % 2 == 0
        self.weights = nnx.Param(
            jax.random.normal(rngs.params(), (dim // 2,), param_dtype))

    def __call__(self, x: Array) -> Array:
        x = x[:, None]
        freqs = x * self.weights.value[None, :].astype(x.dtype) * 2 * math.pi
        return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class NumberEmbedder(nnx.Module):
    """Positional-embed a float then project (reference :34-52)."""

    def __init__(self, features: int, dim: int = 256, *, param_dtype,
                 rngs: nnx.Rngs):
        self.pos = LearnedPositionalEmbedding(dim, param_dtype=param_dtype,
                                              rngs=rngs)
        self.proj = Linear(dim + 1, features, param_dtype=param_dtype,
                           rngs=rngs)

    def __call__(self, x: Array) -> Array:
        return self.proj(self.pos(x))


class NumberConditioner(nnx.Module):
    """Float conditioner with min/max clamping (reference :107-124)."""

    def __init__(self, output_dim: int, min_val: float, max_val: float,
                 dim: int = 256, *, param_dtype, rngs: nnx.Rngs):
        self.min_val = min_val
        self.max_val = max_val
        self.embedder = NumberEmbedder(output_dim, dim,
                                       param_dtype=param_dtype, rngs=rngs)

    def __call__(self, floats: list[float]) -> tuple[Array, Array]:
        x = jnp.clip(jnp.asarray([float(f) for f in floats], jnp.float32),
                     self.min_val, self.max_val)
        x = (x - self.min_val) / (self.max_val - self.min_val)
        emb = self.embedder(x)[:, None]  # [B, 1, C]
        return emb, jnp.ones((emb.shape[0], 1), jnp.float32)


class StableAudioMultiConditioner(nnx.Module):
    """T5 prompt + seconds_start/seconds_total NumberConditioners
    (reference :126-202). The tokenizer is attached by the loader."""

    def __init__(self, config: StableAudioConditionerArchConfig | None = None,
                 *, param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        config = config or StableAudioConditionerArchConfig()
        self.config = config
        t5_cfg = T5ArchConfig(**{k: v for k, v in dict(config.t5).items()
                                 if hasattr(T5ArchConfig, k) or k in {
                                     "vocab_size", "d_model", "d_kv", "d_ff",
                                     "num_layers", "num_heads",
                                     "feed_forward_proj"}})
        self.t5 = T5EncoderModel(t5_cfg, param_dtype=param_dtype, rngs=rngs)
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.seconds_start = NumberConditioner(config.cond_dim,
                                               config.min_val,
                                               config.max_val,
                                               config.number_embed_dim, **kw)
        self.seconds_total = NumberConditioner(config.cond_dim,
                                               config.min_val,
                                               config.max_val,
                                               config.number_embed_dim, **kw)
        self.cross_attention_cond_ids = tuple(config.cross_attention_cond_ids)
        self.global_cond_ids = tuple(config.global_cond_ids)
        self.tokenizer = None  # attached by the component loader
        self.max_length = config.t5_max_length

    def _encode_prompt(self, texts: list[str]) -> tuple[Array, Array]:
        assert self.tokenizer is not None, "loader must attach a tokenizer"
        enc = self.tokenizer(texts, truncation=True,
                             max_length=self.max_length,
                             padding="max_length", return_tensors="np")
        ids = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc["attention_mask"])
        out = self.t5(ids, mask)
        emb = out.last_hidden_state * mask[..., None].astype(
            out.last_hidden_state.dtype)
        return emb, mask

    def __call__(self, batch_metadata: list[dict]) -> dict:
        out = {}
        if "prompt" in self.cross_attention_cond_ids:
            out["prompt"] = self._encode_prompt(
                [m["prompt"] for m in batch_metadata])
        for key, cond in (("seconds_start", self.seconds_start),
                          ("seconds_total", self.seconds_total)):
            out[key] = cond([m[key] for m in batch_metadata])
        return out

    def get_conditioning_inputs(self, cond: dict):
        """(cross_attn_cond, cross_attn_mask, global_embed) triple
        (reference :160-177). Sub-embeds are padded to a common width."""
        dim = max(cond[i][0].shape[-1]
                  for i in self.cross_attention_cond_ids)

        def pad(e):
            if e.shape[-1] < dim:
                e = jnp.pad(e, ((0, 0), (0, 0), (0, dim - e.shape[-1])))
            return e

        x_embs = [pad(cond[i][0].astype(jnp.float32))
                  for i in self.cross_attention_cond_ids]
        x_masks = [cond[i][1].astype(jnp.float32)
                   for i in self.cross_attention_cond_ids]
        cross = jnp.concatenate(x_embs, axis=1)
        mask = jnp.concatenate(x_masks, axis=1)
        glob = jnp.concatenate(
            [cond[i][0][:, 0].astype(jnp.float32)
             for i in self.global_cond_ids], axis=-1)
        return cross, mask, glob


EntryClass = StableAudioMultiConditioner
