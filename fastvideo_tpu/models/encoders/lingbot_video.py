"""LingBot-Video text conditioner: the Qwen3-VL language-model subset.

Behavioral reference: /root/reference/fastvideo/models/encoders/
lingbot_video.py (:22-221): a standard Qwen3 decoder (GQA, per-head q/k
RMSNorm, NeoX rope) loaded from a Qwen3-VL checkpoint with the
``model.language_model.`` prefix stripped and the vision tower / LM head
dropped. Numerically identical to our parity-tested Qwen3 encoder — this
module only adds the checkpoint-prefix mapping and the LingBot defaults.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.models.encoders.qwen3 import (Qwen3ArchConfig,
                                                 Qwen3EncoderModel)

LINGBOT_VIDEO_TEXT_PARAM_NAMES_MAPPING: dict[str, str] = {
    # official compound checkpoint keys
    r"^model\.language_model\.embed_tokens\.(.*)$": r"embed_tokens.\1",
    r"^model\.language_model\.layers\.(\d+)\.(.*)$": r"layers.\1.\2",
    r"^model\.language_model\.norm\.(.*)$": r"norm.\1",
    # converted native keys
    r"^model\.embed_tokens\.(.*)$": r"embed_tokens.\1",
    r"^model\.layers\.(\d+)\.(.*)$": r"layers.\1.\2",
    r"^model\.norm\.(.*)$": r"norm.\1",
}


@dataclasses.dataclass
class LingBotVideoQwen3VLTextArchConfig(Qwen3ArchConfig):
    vocab_size: int = 151936
    hidden_size: int = 2048
    intermediate_size: int = 6144
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 5000000.0
    text_len: int = 1024


@dataclasses.dataclass
class LingBotVideoQwen3VLTextConfig(ModelConfig):
    arch_config: LingBotVideoQwen3VLTextArchConfig = dataclasses.field(
        default_factory=LingBotVideoQwen3VLTextArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(
            LINGBOT_VIDEO_TEXT_PARAM_NAMES_MAPPING))


class LingBotVideoQwen3VLTextModel(Qwen3EncoderModel):
    """Qwen3-VL language model without vision tower or LM head."""


EntryClass = LingBotVideoQwen3VLTextModel
