"""daVinci-MagiHuman DiT config.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
magi_human.py (:33-110). The checkpoint names map 1:1 (packed-expert
weights keep their [out*experts, in] layout); the only rename is the
reference's ``block.layers.<i>`` wrapper -> our flat ``layers.<i>``.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig

MAGI_HUMAN_PARAM_NAMES_MAPPING: dict = {
    r"^block\.layers\.(\d+)\.(.*)$": r"layers.\1.\2",
}


@dataclasses.dataclass
class MagiHumanArchConfig(DiTArchConfig):
    num_layers: int = 40
    hidden_size: int = 5120
    head_dim: int = 128
    num_query_groups: int = 8
    video_in_channels: int = 192
    audio_in_channels: int = 64
    text_in_channels: int = 3584
    mm_layers: tuple[int, ...] = (0, 1, 2, 3, 36, 37, 38, 39)
    local_attn_layers: tuple[int, ...] = ()
    frame_receptive_field: int = 11
    gelu7_layers: tuple[int, ...] = (0, 1, 2, 3)
    post_norm_layers: tuple[int, ...] = ()
    enable_attn_gating: bool = True
    patch_size: tuple[int, int, int] = (1, 2, 2)

    @property
    def num_attention_heads(self) -> int:
        return self.hidden_size // self.head_dim

    @property
    def num_heads_kv(self) -> int:
        return self.num_query_groups

    @property
    def in_channels(self) -> int:
        return self.video_in_channels

    @property
    def num_channels_latents(self) -> int:
        return 48


@dataclasses.dataclass
class MagiHumanVideoConfig(ModelConfig):
    arch_config: MagiHumanArchConfig = dataclasses.field(
        default_factory=MagiHumanArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(MAGI_HUMAN_PARAM_NAMES_MAPPING))
