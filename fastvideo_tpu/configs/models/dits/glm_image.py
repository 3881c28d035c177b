"""GLM-Image DiT config + checkpoint mapping.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
glm_image.py (:17-61).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig

GLM_IMAGE_PARAM_NAMES_MAPPING: dict = {
    r"^glyph_projector\.net\.0\.proj\.(.*)$": r"glyph_projector.fc_in.\1",
    r"^glyph_projector\.net\.2\.(.*)$": r"glyph_projector.fc_out.\1",
    r"^prior_projector\.net\.0\.proj\.(.*)$": r"prior_projector.fc_in.\1",
    r"^prior_projector\.net\.2\.(.*)$": r"prior_projector.fc_out.\1",
    r"^transformer_blocks\.(\d+)\.ff\.net\.0\.proj\.(.*)$":
    r"transformer_blocks.\1.ff.fc_in.\2",
    r"^transformer_blocks\.(\d+)\.ff\.net\.2\.(.*)$":
    r"transformer_blocks.\1.ff.fc_out.\2",
    r"^(.*)\.attn1\.to_out\.0\.(.*)$": r"\1.attn1.to_out.\2",
    r"^image_projector\.proj\.(.*)$": r"image_proj.\1",
}


@dataclasses.dataclass
class GlmImageArchConfig(DiTArchConfig):
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 30
    text_embed_dim: int = 1472
    time_embed_dim: int = 512
    condition_dim: int = 256
    prior_vq_quantizer_codebook_size: int = 16384
    patch_size: int = 2

    @property
    def num_channels_latents(self) -> int:
        return self.out_channels


@dataclasses.dataclass
class GlmImageDiTConfig(ModelConfig):
    arch_config: GlmImageArchConfig = dataclasses.field(
        default_factory=GlmImageArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(GLM_IMAGE_PARAM_NAMES_MAPPING))
