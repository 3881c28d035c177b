"""CLIP vision encoder config (analog of reference configs/models/encoders/clip.py)."""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import EncoderArchConfig, ModelConfig

# HF CLIPVisionModel checkpoint names -> our module tree (mostly identity).
CLIP_VISION_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^vision_model\.encoder\.layers\.(.*)$": r"vision_model.layers.\1",
    r"^vision_model\.(.*)$": r"vision_model.\1",
}


@dataclasses.dataclass
class CLIPVisionArchConfig(EncoderArchConfig):
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: int = 1024

    # preprocessing
    image_mean: tuple[float, ...] = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple[float, ...] = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass
class CLIPVisionConfig(ModelConfig):
    arch_config: CLIPVisionArchConfig = dataclasses.field(
        default_factory=CLIPVisionArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(CLIP_VISION_PARAM_NAMES_MAPPING))
