"""Qwen3 text encoder.

Behavioral reference: /root/reference/fastvideo/models/encoders/qwen3.py
and HF Qwen3Model: the Llama stack with per-head q/k RMSNorm, explicit
head_dim, no qkv bias, rope theta 1e6. Used by Kandinsky-5 / MiniMax
text conditioning.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.models.encoders.llama import (LLAMA_PARAM_NAMES_MAPPING,
                                                 LlamaArchConfig,
                                                 LlamaEncoderModel)

QWEN3_PARAM_NAMES_MAPPING = dict(LLAMA_PARAM_NAMES_MAPPING)


@dataclasses.dataclass
class Qwen3ArchConfig(LlamaArchConfig):
    vocab_size: int = 151936
    hidden_size: int = 4096
    intermediate_size: int = 12288
    num_hidden_layers: int = 36
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    qk_norm: bool = True


@dataclasses.dataclass
class Qwen3Config(ModelConfig):
    arch_config: Qwen3ArchConfig = dataclasses.field(
        default_factory=Qwen3ArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(QWEN3_PARAM_NAMES_MAPPING))


class Qwen3EncoderModel(LlamaEncoderModel):
    """Qwen3 text model (qk RMSNorm via config)."""


EntryClass = Qwen3EncoderModel
