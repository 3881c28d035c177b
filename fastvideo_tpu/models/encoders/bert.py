"""BERT text encoder (HunyuanDiT's bilingual CLIP uses BertModel).

Behavioral reference: /root/reference/fastvideo/models/encoders/bert.py
(which wraps transformers BertModel): post-LN transformer with absolute +
token-type embeddings, gelu MLPs, tanh pooler over the [CLS] token.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import EncoderArchConfig, ModelConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.models.encoders.siglip import _LayerNorm
from fastvideo_tpu.models.encoders.t5 import BaseEncoderOutput, Embedding

Array = jax.Array

BERT_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^embeddings\.LayerNorm\.(.*)$": r"embeddings.layer_norm.\1",
    r"^encoder\.layer\.(\d+)\.attention\.self\.(query|key|value)\.(.*)$":
    r"layers.\1.attention.\2.\3",
    r"^encoder\.layer\.(\d+)\.attention\.output\.dense\.(.*)$":
    r"layers.\1.attention.output.\2",
    r"^encoder\.layer\.(\d+)\.attention\.output\.LayerNorm\.(.*)$":
    r"layers.\1.attention.layer_norm.\2",
    r"^encoder\.layer\.(\d+)\.intermediate\.dense\.(.*)$":
    r"layers.\1.intermediate.\2",
    r"^encoder\.layer\.(\d+)\.output\.dense\.(.*)$": r"layers.\1.output.\2",
    r"^encoder\.layer\.(\d+)\.output\.LayerNorm\.(.*)$":
    r"layers.\1.output_layer_norm.\2",
    r"^embeddings\.(.*)$": r"embeddings.\1",
    r"^pooler\.dense\.(.*)$": r"pooler.\1",
}


@dataclasses.dataclass
class BertArchConfig(EncoderArchConfig):
    vocab_size: int = 47020
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    text_len: int = 77


@dataclasses.dataclass
class BertConfig(ModelConfig):
    arch_config: BertArchConfig = dataclasses.field(
        default_factory=BertArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(BERT_PARAM_NAMES_MAPPING))


class BertEmbeddings(nnx.Module):
    def __init__(self, cfg: BertArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.word_embeddings = Embedding(cfg.vocab_size, cfg.hidden_size,
                                         **kw)
        self.position_embeddings = Embedding(cfg.max_position_embeddings,
                                             cfg.hidden_size, **kw)
        self.token_type_embeddings = Embedding(cfg.type_vocab_size,
                                               cfg.hidden_size, **kw)
        self.layer_norm = _LayerNorm(cfg.hidden_size, cfg.layer_norm_eps,
                                     **kw)

    def __call__(self, input_ids: Array) -> Array:
        pos = jnp.arange(input_ids.shape[1])
        x = (self.word_embeddings(input_ids) +
             self.position_embeddings(pos)[None] +
             self.token_type_embeddings.weight.value[0][None, None])
        return self.layer_norm(x)


class BertSelfAttention(nnx.Module):
    def __init__(self, cfg: BertArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        d = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.head_dim = d // self.num_heads
        self.query = Linear(d, d, **kw)
        self.key = Linear(d, d, **kw)
        self.value = Linear(d, d, **kw)
        self.output = Linear(d, d, **kw)
        self.layer_norm = _LayerNorm(d, cfg.layer_norm_eps, **kw)

    def __call__(self, x: Array, mask_bias: Array | None) -> Array:
        b, s, _ = x.shape
        q = self.query(x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(x).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(x).reshape(b, s, self.num_heads, self.head_dim)
        out = jax.nn.dot_product_attention(q, k, v, bias=mask_bias)
        out = self.output(out.reshape(b, s, -1))
        return self.layer_norm(x + out)  # post-LN


class BertLayer(nnx.Module):
    def __init__(self, cfg: BertArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.attention = BertSelfAttention(cfg, **kw)
        self.intermediate = Linear(cfg.hidden_size, cfg.intermediate_size,
                                   **kw)
        self.output = Linear(cfg.intermediate_size, cfg.hidden_size, **kw)
        self.output_layer_norm = _LayerNorm(cfg.hidden_size,
                                            cfg.layer_norm_eps, **kw)

    def __call__(self, x: Array, mask_bias: Array | None) -> Array:
        x = self.attention(x, mask_bias)
        h = self.output(jax.nn.gelu(self.intermediate(x),
                                    approximate=False))
        return self.output_layer_norm(x + h)


class BertEncoderModel(nnx.Module):
    def __init__(self, config: BertArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.embeddings = BertEmbeddings(config, **kw)
        self.layers = nnx.List([
            BertLayer(config, **kw)
            for _ in range(config.num_hidden_layers)
        ])
        self.pooler = Linear(config.hidden_size, config.hidden_size, **kw)

    def __call__(self, input_ids: Array,
                 attention_mask: Array | None = None,
                 **kwargs) -> BaseEncoderOutput:
        x = self.embeddings(input_ids)
        bias = None
        if attention_mask is not None:
            ok = attention_mask[:, None, None, :] > 0
            bias = jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min)
        for layer in self.layers:
            x = layer(x, bias)
        out = BaseEncoderOutput(last_hidden_state=x,
                                attention_mask=attention_mask)
        out.pooler_output = jnp.tanh(self.pooler(x[:, 0]))
        return out


EntryClass = BertEncoderModel
