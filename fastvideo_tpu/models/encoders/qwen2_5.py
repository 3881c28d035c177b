"""Qwen2 / Qwen2.5 text encoder.

Behavioral reference: /root/reference/fastvideo/models/encoders/qwen2_5.py
(:97-390): a Llama-family decoder used as a text encoder, differing only
in biased q/k/v projections and rope theta 1e6. Reuses the Llama stack
(llama.py) with ``attention_bias=True``.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.models.encoders.llama import (LLAMA_PARAM_NAMES_MAPPING,
                                                 LlamaArchConfig,
                                                 LlamaEncoderModel)

QWEN2_PARAM_NAMES_MAPPING = dict(LLAMA_PARAM_NAMES_MAPPING)


@dataclasses.dataclass
class Qwen2ArchConfig(LlamaArchConfig):
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    attention_bias: bool = True


@dataclasses.dataclass
class Qwen2Config(ModelConfig):
    arch_config: Qwen2ArchConfig = dataclasses.field(
        default_factory=Qwen2ArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(QWEN2_PARAM_NAMES_MAPPING))


class Qwen2EncoderModel(LlamaEncoderModel):
    """Qwen2/2.5 text model (identical forward; biased qkv via config)."""


EntryClass = Qwen2EncoderModel
