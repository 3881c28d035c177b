"""HunyuanVideo-1.5 DiT config + HF checkpoint mapping.

Mirrors /root/reference/fastvideo/configs/models/dits/hunyuanvideo15.py
(:20-160): 54-layer pure double-stream MM-DiT, 16 heads x 128, byt5 second
text stream, SigLIP image embeds for i2v, rope (16,56,56) theta 256,
optional MeanFlow reference-timestep embedder.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig
from fastvideo_tpu.configs.models.dits.hunyuan import (
    HUNYUAN_PARAM_NAMES_MAPPING)

# The refiner/double-stream key layout matches HunyuanVideo's diffusers
# export; hy1.5 adds the second text stream (context_embedder_2), the
# split time_embed module, and drops the single-stream stack.
HUNYUAN15_PARAM_NAMES_MAPPING: dict = {
    k: v
    for k, v in HUNYUAN_PARAM_NAMES_MAPPING.items()
    if not k.startswith(r"^single_transformer_blocks") and
    not k.startswith(r"^time_text_embed")
}
HUNYUAN15_PARAM_NAMES_MAPPING.update({
    r"^context_embedder\.token_refiner\.refiner_blocks\.(\d+)\.self_attn_qkv\.(.*)$":
    r"txt_in.refiner_blocks.\1.self_attn_qkv.\2",
    r"^context_embedder_2\.(.*)$": r"txt_in_2.\1",
    r"^time_embed\.timestep_embedder\.linear_1\.(.*)$":
    r"time_in.timestep_embedder.mlp.fc_in.\1",
    r"^time_embed\.timestep_embedder\.linear_2\.(.*)$":
    r"time_in.timestep_embedder.mlp.fc_out.\1",
    r"^time_embed\.timestep_embedder_r\.linear_1\.(.*)$":
    r"time_in.timestep_embedder_r.mlp.fc_in.\1",
    r"^time_embed\.timestep_embedder_r\.linear_2\.(.*)$":
    r"time_in.timestep_embedder_r.mlp.fc_out.\1",
})


@dataclasses.dataclass
class HunyuanVideo15ArchConfig(DiTArchConfig):
    in_channels: int = 65
    out_channels: int = 32
    num_attention_heads: int = 16
    attention_head_dim: int = 128
    num_layers: int = 54
    num_refiner_layers: int = 2
    mlp_ratio: float = 4.0
    patch_size: int = 1
    patch_size_t: int = 1
    text_embed_dim: int = 3584
    text_embed_2_dim: int = 1472
    image_embed_dim: int = 1152
    rope_theta: float = 256.0
    rope_axes_dim: tuple[int, ...] = (16, 56, 56)
    use_meanflow: bool = False

    @property
    def hidden_size(self) -> int:
        return self.attention_head_dim * self.num_attention_heads

    @property
    def num_channels_latents(self) -> int:
        return self.out_channels

    @property
    def patch_size_thw(self) -> tuple[int, int, int]:
        return (self.patch_size_t, self.patch_size, self.patch_size)


@dataclasses.dataclass
class HunyuanVideo15Config(ModelConfig):
    arch_config: HunyuanVideo15ArchConfig = dataclasses.field(
        default_factory=HunyuanVideo15ArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(HUNYUAN15_PARAM_NAMES_MAPPING))
