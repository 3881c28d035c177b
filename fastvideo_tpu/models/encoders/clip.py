"""CLIP vision transformer (image encoder for I2V conditioning).

Behavioral reference: /root/reference/fastvideo/models/encoders/clip.py
(:31-650, itself a vLLM-style HF CLIP reimplementation). Module tree follows
HF CLIPVisionModel so checkpoints load near-verbatim (including the upstream
"pre_layrnorm" typo).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.encoders.clip import CLIPVisionArchConfig
from fastvideo_tpu.layers.activation import get_act_fn
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.models.encoders.t5 import BaseEncoderOutput, Embedding

Array = jax.Array


class LayerNorm(nnx.Module):
    """Standard affine LayerNorm (fp32 stats)."""

    def __init__(self, dim: int, eps: float = 1e-5, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        del rngs
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((dim,), param_dtype))
        self.bias = nnx.Param(jnp.zeros((dim,), param_dtype))

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        out = out * self.weight.value.astype(jnp.float32) + \
            self.bias.value.astype(jnp.float32)
        return out.astype(x.dtype)


class CLIPVisionEmbeddings(nnx.Module):
    def __init__(self, config: CLIPVisionArchConfig, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        self.config = config
        dim = config.hidden_size
        self.class_embedding = nnx.Param(
            jax.random.normal(rngs.params(), (dim,), param_dtype))
        # patch conv as matmul over flattened patches (kernel [P*P*C, dim])
        patch_in = config.patch_size**2 * config.num_channels
        self.patch_embedding = Linear(patch_in, dim, bias=False,
                                      param_dtype=param_dtype, rngs=rngs)
        num_positions = (config.image_size // config.patch_size)**2 + 1
        self.position_embedding = Embedding(num_positions, dim,
                                            param_dtype=param_dtype,
                                            rngs=rngs)

    def __call__(self, pixel_values: Array) -> Array:
        """pixel_values: [B, C, H, W] -> [B, 1+P, dim]."""
        b, c, hh, ww = pixel_values.shape
        p = self.config.patch_size
        x = pixel_values.reshape(b, c, hh // p, p, ww // p, p)
        # HF conv weight [dim, C, p, p] contracts features ordered (C, ph, pw)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, c * p * p)
        patches = self.patch_embedding(x)
        cls = jnp.broadcast_to(
            self.class_embedding.value.astype(patches.dtype)[None, None],
            (b, 1, patches.shape[-1]))
        x = jnp.concatenate([cls, patches], axis=1)
        pos = self.position_embedding(jnp.arange(x.shape[1]))
        return x + pos.astype(x.dtype)


class CLIPAttention(nnx.Module):
    def __init__(self, config: CLIPVisionArchConfig, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        dim = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = dim // self.num_heads
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.q_proj = Linear(dim, dim, **kw)
        self.k_proj = Linear(dim, dim, **kw)
        self.v_proj = Linear(dim, dim, **kw)
        self.out_proj = Linear(dim, dim, **kw)

    def __call__(self, x: Array) -> Array:
        b, s, _ = x.shape
        n, d = self.num_heads, self.head_dim
        q = self.q_proj(x).reshape(b, s, n, d)
        k = self.k_proj(x).reshape(b, s, n, d)
        v = self.v_proj(x).reshape(b, s, n, d)
        out = jax.nn.dot_product_attention(q, k, v)
        return self.out_proj(out.reshape(b, s, -1))


class CLIPMLP(nnx.Module):
    def __init__(self, config: CLIPVisionArchConfig, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, **kw)
        self.act = get_act_fn(
            "quick_gelu" if config.hidden_act == "quick_gelu" else
            config.hidden_act)

    def __call__(self, x: Array) -> Array:
        return self.fc2(self.act(self.fc1(x)))


class CLIPEncoderLayer(nnx.Module):
    def __init__(self, config: CLIPVisionArchConfig, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.self_attn = CLIPAttention(config, **kw)
        self.layer_norm1 = LayerNorm(config.hidden_size,
                                     config.layer_norm_eps, **kw)
        self.mlp = CLIPMLP(config, **kw)
        self.layer_norm2 = LayerNorm(config.hidden_size,
                                     config.layer_norm_eps, **kw)

    def __call__(self, x: Array) -> Array:
        x = x + self.self_attn(self.layer_norm1(x))
        x = x + self.mlp(self.layer_norm2(x))
        return x


class CLIPVisionTransformer(nnx.Module):
    def __init__(self, config: CLIPVisionArchConfig, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.embeddings = CLIPVisionEmbeddings(config, **kw)
        self.pre_layrnorm = LayerNorm(config.hidden_size,
                                      config.layer_norm_eps, **kw)
        self.layers = nnx.List([
            CLIPEncoderLayer(config, **kw)
            for _ in range(config.num_hidden_layers)
        ])
        self.post_layernorm = LayerNorm(config.hidden_size,
                                        config.layer_norm_eps, **kw)

    def __call__(self, pixel_values: Array,
                 skip_post_norm: bool = False) -> Array:
        x = self.pre_layrnorm(self.embeddings(pixel_values))
        for layer in self.layers:
            x = layer(x)
        if not skip_post_norm:
            x = self.post_layernorm(x)
        return x


class CLIPVisionModel(nnx.Module):
    """HF-layout vision tower (reference clip.py:604-650)."""

    def __init__(self, config: CLIPVisionArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.vision_model = CLIPVisionTransformer(config,
                                                  param_dtype=param_dtype,
                                                  rngs=rngs)

    def __call__(self, pixel_values: Array, **kwargs) -> BaseEncoderOutput:
        hidden = self.vision_model(pixel_values)
        return BaseEncoderOutput(last_hidden_state=hidden)


def preprocess_image(pil_image, config: CLIPVisionArchConfig):
    """PIL -> normalized [1, 3, S, S] fp32 (CLIPImageProcessor semantics)."""
    import numpy as np

    size = config.image_size
    img = pil_image.convert("RGB").resize((size, size))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    mean = np.asarray(config.image_mean, np.float32)
    std = np.asarray(config.image_std, np.float32)
    arr = (arr - mean) / std
    return arr.transpose(2, 0, 1)[None]


EntryClass = CLIPVisionModel


# -- text tower --------------------------------------------------------------

import dataclasses

from fastvideo_tpu.configs.models.base import EncoderArchConfig, ModelConfig


@dataclasses.dataclass
class CLIPTextArchConfig(EncoderArchConfig):
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    text_len: int = 77
    # non-zero -> CLIPTextModelWithProjection (bias-free text_projection)
    projection_dim: int = 0


CLIP_TEXT_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^text_model\.encoder\.layers\.(.*)$": r"text_model.layers.\1",
    r"^text_model\.(.*)$": r"text_model.\1",
}


@dataclasses.dataclass
class CLIPTextConfig(ModelConfig):
    arch_config: CLIPTextArchConfig = dataclasses.field(
        default_factory=CLIPTextArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(CLIP_TEXT_PARAM_NAMES_MAPPING))


class CLIPTextEmbeddings(nnx.Module):
    def __init__(self, config: CLIPTextArchConfig, *, param_dtype, rngs):
        self.token_embedding = Embedding(config.vocab_size,
                                         config.hidden_size,
                                         param_dtype=param_dtype, rngs=rngs)
        self.position_embedding = Embedding(config.max_position_embeddings,
                                            config.hidden_size,
                                            param_dtype=param_dtype,
                                            rngs=rngs)

    def __call__(self, input_ids: Array) -> Array:
        pos = jnp.arange(input_ids.shape[1])
        return self.token_embedding(input_ids) + self.position_embedding(pos)


class CLIPTextTransformer(nnx.Module):
    def __init__(self, config: CLIPTextArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        # encoder layers are identical to the vision tower's
        vis_like = CLIPVisionArchConfig(
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            hidden_act=config.hidden_act,
            layer_norm_eps=config.layer_norm_eps)
        self.embeddings = CLIPTextEmbeddings(config, **kw)
        self.layers = nnx.List([
            CLIPEncoderLayer(vis_like, **kw)
            for _ in range(config.num_hidden_layers)
        ])
        self.final_layer_norm = LayerNorm(config.hidden_size,
                                          config.layer_norm_eps, **kw)
        self.config = config

    def __call__(self, input_ids: Array,
                 attention_mask: Array | None = None,
                 output_hidden_states: bool = False):
        x = self.embeddings(input_ids)
        s = x.shape[1]
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        ok = causal
        if attention_mask is not None:
            ok = ok & (attention_mask[:, None, None, :] > 0)
        bias = jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min).astype(x.dtype)
        hidden_states = [x] if output_hidden_states else None
        for layer in self.layers:
            # CLIP text uses causal attention
            residual = x
            h = layer.layer_norm1(x)
            b, ss, _ = h.shape
            n, d = layer.self_attn.num_heads, layer.self_attn.head_dim
            q = layer.self_attn.q_proj(h).reshape(b, ss, n, d)
            k = layer.self_attn.k_proj(h).reshape(b, ss, n, d)
            v = layer.self_attn.v_proj(h).reshape(b, ss, n, d)
            attn = jax.nn.dot_product_attention(q, k, v, bias=bias)
            x = residual + layer.self_attn.out_proj(attn.reshape(b, ss, -1))
            x = x + layer.mlp(layer.layer_norm2(x))
            if output_hidden_states:
                hidden_states.append(x)
        x = self.final_layer_norm(x)
        # pooled = hidden at the EOS token. HF quirk: with the legacy
        # eos_token_id == 2 configs, CLIPTextModel pools at
        # input_ids.argmax(-1) (the highest token id); otherwise at the
        # first EOS occurrence.
        eos = self.config.eos_token_id
        if eos == 2:
            idx = jnp.argmax(input_ids, axis=1)
        else:
            idx = jnp.argmax((input_ids == eos).astype(jnp.int32), axis=1)
        pooled = x[jnp.arange(x.shape[0]), idx]
        return x, pooled, hidden_states


class CLIPTextModel(nnx.Module):
    """HF-layout CLIP text encoder (reference clip.py:428-530).

    With ``config.projection_dim`` set this is CLIPTextModelWithProjection:
    pooler_output runs through the bias-free text_projection."""

    def __init__(self, config: CLIPTextArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.text_model = CLIPTextTransformer(config,
                                              param_dtype=param_dtype,
                                              rngs=rngs)
        proj_dim = getattr(config, "projection_dim", 0) or 0
        self.text_projection = (Linear(config.hidden_size, proj_dim,
                                       bias=False, param_dtype=param_dtype,
                                       rngs=rngs) if proj_dim else None)

    def __call__(self, input_ids: Array,
                 attention_mask: Array | None = None,
                 output_hidden_states: bool = False,
                 **kwargs) -> BaseEncoderOutput:
        hidden, pooled, hidden_states = self.text_model(
            input_ids, attention_mask,
            output_hidden_states=output_hidden_states)
        if self.text_projection is not None:
            pooled = self.text_projection(pooled)
        out = BaseEncoderOutput(last_hidden_state=hidden,
                                attention_mask=attention_mask)
        out.pooler_output = pooled
        out.hidden_states = (tuple(hidden_states)
                             if hidden_states is not None else None)
        return out
