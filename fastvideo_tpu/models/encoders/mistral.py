"""Mistral text encoder (FLUX.2 uses Mistral3's language model).

Behavioral reference: /root/reference/fastvideo/models/encoders/mistral3.py
(wraps transformers Mistral3); the text stack is the Llama architecture
with explicit head_dim and no qkv bias.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.models.encoders.llama import (LLAMA_PARAM_NAMES_MAPPING,
                                                 LlamaArchConfig,
                                                 LlamaEncoderModel)

MISTRAL_PARAM_NAMES_MAPPING = dict(LLAMA_PARAM_NAMES_MAPPING)


@dataclasses.dataclass
class MistralArchConfig(LlamaArchConfig):
    vocab_size: int = 131072
    hidden_size: int = 5120
    intermediate_size: int = 32768
    num_hidden_layers: int = 40
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 1000000000.0
    rms_norm_eps: float = 1e-6


@dataclasses.dataclass
class MistralConfig(ModelConfig):
    arch_config: MistralArchConfig = dataclasses.field(
        default_factory=MistralArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(MISTRAL_PARAM_NAMES_MAPPING))


class MistralEncoderModel(LlamaEncoderModel):
    """MistralModel used as a text encoder."""


EntryClass = MistralEncoderModel
