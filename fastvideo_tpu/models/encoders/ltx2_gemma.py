"""LTX-2 Gemma text stack: Gemma backbone + feature extractor + dual
Embeddings1DConnector (video / audio).

Behavioral reference: /root/reference/fastvideo/models/encoders/gemma.py
(:53-753): all Gemma hidden states are stacked per token, min-max
normalised over the valid tokens (x8 scaling), aggregated by one linear,
then refined by two small 1-D transformer connectors (LTX rope over the
token index, learnable registers replacing padded slots, final RMS norm)
— one for the video stream, one for audio.

TPU shape: the whole stack (backbone + both connectors) runs as one
jitted program through TextEncodingStage; the register replacement's
per-row left-alignment is a stable argsort + gather (static shapes).

Checkpoint layout: one safetensors set containing both the connector
weights and the backbone under ``gemma_model.*`` (conversion scripts
merge the HF ``gemma/`` subdir with that prefix; the reference lazily
loads the subdir instead).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import EncoderArchConfig, ModelConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.models.dits.ltx2 import (LTXFeedForward,
                                            LTXSelfAttention, ltx_freqs_cis)
from fastvideo_tpu.models.encoders.gemma import (GemmaArchConfig,
                                                 GemmaEncoderModel)
from fastvideo_tpu.models.encoders.t5 import BaseEncoderOutput

Array = jax.Array

LTX2_GEMMA_PARAM_NAMES_MAPPING: dict[str, str] = {
    # HF subdir weights merged under the gemma_model prefix
    r"^gemma_model\.model\.(.*)$": r"gemma_model.\1",
    r"^gemma\.model\.(.*)$": r"gemma_model.\1",
    r"^text_encoders\.gemma\.(.*)$": r"\1",
    # torch Sequential/GELUApprox spellings inside the connectors
    r"^(.*)\.to_out\.0\.(weight|bias)$": r"\1.to_out.\2",
    r"^(.*ff)\.net\.0\.proj\.(weight|bias)$": r"\1.net_in.proj.\2",
    r"^(.*ff)\.net\.2\.(weight|bias)$": r"\1.net_out.\2",
    r"^feature_extractor_linear\.aggregate_embed\.(weight|bias)$":
    r"feature_extractor_linear.\1",
}


@dataclasses.dataclass
class LTX2GemmaArchConfig(EncoderArchConfig):
    # backbone (Gemma-3 12B text tower at full scale)
    vocab_size: int = 262208
    hidden_size: int = 3840
    intermediate_size: int = 15360
    num_hidden_layers: int = 48
    num_attention_heads: int = 30
    num_key_value_heads: int = 16
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    text_len: int = 1024
    # feature extractor: stack of (num_hidden_layers + 1) hidden states
    feature_extractor_in_features: int = 3840 * 49
    feature_extractor_out_features: int = 3840
    # connectors (reference configs/models/encoders/gemma.py:49-63)
    connector_num_attention_heads: int = 30
    connector_attention_head_dim: int = 128
    connector_num_layers: int = 2
    audio_connector_num_attention_heads: int | None = None
    audio_connector_attention_head_dim: int | None = None
    audio_connector_num_layers: int | None = None
    connector_positional_embedding_theta: float = 10000.0
    connector_positional_embedding_max_pos: tuple[int, ...] = (4096,)
    connector_rope_type: str = "split"
    connector_num_learnable_registers: int | None = 128
    connector_apply_gated_attention: bool = False


@dataclasses.dataclass
class LTX2GemmaConfig(ModelConfig):
    arch_config: LTX2GemmaArchConfig = dataclasses.field(
        default_factory=LTX2GemmaArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(LTX2_GEMMA_PARAM_NAMES_MAPPING))


def _rms_norm(x: Array, eps: float = 1e-6) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def norm_and_concat_padded_batch(stacked: Array, mask: Array) -> Array:
    """[B, T, D, L] hidden-state stack -> [B, T, D*L] min-max normalised
    over the valid tokens, x8 (reference :754-793, right padding)."""
    b, t, d, n = stacked.shape
    eps = 1e-6
    m = (mask > 0)[:, :, None, None]
    seq_lengths = jnp.sum(mask > 0, axis=1).astype(jnp.float32)
    masked = jnp.where(m, stacked, 0.0)
    denom = (seq_lengths * d).reshape(b, 1, 1, 1)
    mean = masked.sum(axis=(1, 2), keepdims=True) / (denom + eps)
    x_min = jnp.where(m, stacked, jnp.inf).min(axis=(1, 2), keepdims=True)
    x_max = jnp.where(m, stacked, -jnp.inf).max(axis=(1, 2), keepdims=True)
    normed = 8.0 * (stacked - mean) / (x_max - x_min + eps)
    normed = normed.reshape(b, t, d * n)
    return jnp.where((mask > 0)[:, :, None], normed, 0.0)


class ConnectorBlock(nnx.Module):
    """functional RMS norm -> attention -> residual -> RMS norm -> FF ->
    residual (reference _BasicTransformerBlock1D:96-151)."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 rope_type: str, apply_gated_attention: bool,
                 norm_eps: float = 1e-6, *, param_dtype, rngs: nnx.Rngs):
        self.norm_eps = norm_eps
        self.attn1 = LTXSelfAttention(dim, None, heads, dim_head, norm_eps,
                                      rope_type, distributed=False,
                                      apply_gated_attention=(
                                          apply_gated_attention),
                                      param_dtype=param_dtype, rngs=rngs)
        self.ff = LTXFeedForward(dim, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array, pe) -> Array:
        x = self.attn1(_rms_norm(x, self.norm_eps), pe=pe) + x
        return self.ff(_rms_norm(x, self.norm_eps)) + x


class Embeddings1DConnector(nnx.Module):
    """(reference Embeddings1DConnector:235-358)."""

    def __init__(self, heads: int, dim_head: int, num_layers: int,
                 theta: float, max_pos: tuple[int, ...], rope_type: str,
                 num_learnable_registers: int | None,
                 apply_gated_attention: bool, *, param_dtype,
                 rngs: nnx.Rngs):
        self.heads = heads
        self.inner_dim = heads * dim_head
        self.theta = theta
        self.max_pos = tuple(max_pos)
        self.rope_type = rope_type
        self.num_learnable_registers = num_learnable_registers
        self.transformer_1d_blocks = nnx.List([
            ConnectorBlock(self.inner_dim, heads, dim_head, rope_type,
                           apply_gated_attention, param_dtype=param_dtype,
                           rngs=rngs)
            for _ in range(num_layers)
        ])
        if num_learnable_registers:
            self.learnable_registers = nnx.Param(
                jax.random.uniform(rngs.params(),
                                   (num_learnable_registers,
                                    self.inner_dim), param_dtype) * 2 - 1)

    def _replace_padded_with_registers(self, x: Array,
                                       mask: Array) -> Array:
        """Left-align each row's valid tokens (stable argsort gather) and
        fill the tail with tiled registers (reference :272-311)."""
        b, s, d = x.shape
        reps = s // self.num_learnable_registers
        registers = jnp.tile(
            self.learnable_registers.value.astype(x.dtype), (reps, 1))
        valid = mask > 0
        order = jnp.argsort(~valid, axis=1, stable=True)
        aligned = jnp.take_along_axis(x, order[:, :, None], axis=1)
        n_valid = valid.sum(axis=1, keepdims=True)
        keep = (jnp.arange(s)[None] < n_valid)[:, :, None]
        return jnp.where(keep, aligned, registers[None])

    def __call__(self, x: Array,
                 mask: Array | None = None) -> tuple[Array, Array]:
        b, s, _ = x.shape
        if self.num_learnable_registers:
            if mask is None:
                mask = jnp.ones((b, s), jnp.int32)
            x = self._replace_padded_with_registers(x, mask)
            mask = jnp.ones((b, s), jnp.int32)
        # 1-D rope over the token index ([B, n_pos=1, S, 2] bounds grid)
        idx = jnp.broadcast_to(
            jnp.arange(s, dtype=jnp.float32)[None, None], (b, 1, s))
        grid = jnp.stack([idx, idx], axis=-1)
        pe = ltx_freqs_cis(grid, self.inner_dim, self.theta, self.max_pos,
                           use_middle=False, num_heads=self.heads,
                           rope_type=self.rope_type)
        for block in self.transformer_1d_blocks:
            x = block(x, pe)
        return _rms_norm(x), mask


class LTX2GemmaTextEncoderModel(nnx.Module):
    """Backbone + feature extractor + video/audio connectors.

    Returns BaseEncoderOutput with ``last_hidden_state`` = video text
    embeddings and ``audio_hidden_state`` = the audio connector's output
    (reference forward:640-753).
    """

    def __init__(self, config: LTX2GemmaArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        backbone_cfg = GemmaArchConfig(
            vocab_size=config.vocab_size, hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            num_key_value_heads=config.num_key_value_heads,
            head_dim=config.head_dim, rms_norm_eps=config.rms_norm_eps,
            rope_theta=config.rope_theta, text_len=config.text_len)
        self.gemma_model = GemmaEncoderModel(backbone_cfg, **kw)
        self.feature_extractor_linear = Linear(
            config.feature_extractor_in_features,
            config.feature_extractor_out_features, bias=False, **kw)

        def connector(heads, dim_head, layers):
            return Embeddings1DConnector(
                heads, dim_head, layers,
                config.connector_positional_embedding_theta,
                config.connector_positional_embedding_max_pos,
                config.connector_rope_type,
                config.connector_num_learnable_registers,
                config.connector_apply_gated_attention, **kw)

        self.embeddings_connector = connector(
            config.connector_num_attention_heads,
            config.connector_attention_head_dim,
            config.connector_num_layers)
        self.audio_embeddings_connector = connector(
            config.audio_connector_num_attention_heads
            or config.connector_num_attention_heads,
            config.audio_connector_attention_head_dim
            or config.connector_attention_head_dim,
            config.audio_connector_num_layers
            or config.connector_num_layers)

    def __call__(self, input_ids: Array,
                 attention_mask: Array | None = None,
                 **kwargs) -> BaseEncoderOutput:
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        out = self.gemma_model(input_ids, attention_mask,
                               output_hidden_states=True)
        # hidden_states: (embed, layer_1..N, final_norm) — the reference
        # stacks HF's (embed, layers...) tuple WITHOUT the final norm,
        # i.e. num_hidden_layers + 1 entries.
        stacked = jnp.stack(out.hidden_states[:-1], axis=-1)
        feats = norm_and_concat_padded_batch(stacked, attention_mask)
        shared = self.feature_extractor_linear(
            feats.astype(stacked.dtype))
        video, video_mask = self.embeddings_connector(
            shared, attention_mask)
        video = video * (video_mask > 0)[:, :, None].astype(video.dtype)
        audio, _ = self.audio_embeddings_connector(shared, attention_mask)
        return BaseEncoderOutput(last_hidden_state=video,
                                 attention_mask=video_mask,
                                 audio_hidden_state=audio)


EntryClass = LTX2GemmaTextEncoderModel
