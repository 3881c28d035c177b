"""MiniMax H3 DiT config + checkpoint mapping.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
minimax_h3.py (:34-67).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig

MINIMAX_H3_PARAM_NAMES_MAPPING: dict = {
    r"^time_embedder\.linear_1\.(.*)$": r"time_embedder.fc_in.\1",
    r"^time_embedder\.linear_2\.(.*)$": r"time_embedder.fc_out.\1",
    r"^(.*)\.attn\.to_out\.0\.(.*)$": r"\1.attn.to_out.\2",
    r"^(.*)\.ff\.net\.0\.proj\.(.*)$": r"\1.ff.fc_in.\2",
    r"^(.*)\.ff\.net\.2\.(.*)$": r"\1.ff.fc_out.\2",
}


@dataclasses.dataclass
class MiniMaxH3ArchConfig(DiTArchConfig):
    num_attention_heads: int = 56
    attention_head_dim: int = 128
    hidden_size: int = 5376
    num_layers: int = 50
    num_refiner_layers: int = 2
    ffn_dim: int = 14336
    in_channels: int = 24
    audio_in_channels: int = 32
    patch_size: tuple[int, int, int] = (1, 2, 2)
    text_dim: int = 5120
    freq_dim: int = 256
    time_embed_hidden_dim: int = 5376
    time_embed_dim: int = 2688
    rope_freq_dim: int = 16
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    qk_norm_eps: float = 1e-5
    final_norm_eps: float = 1e-5

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels


@dataclasses.dataclass
class MiniMaxH3Config(ModelConfig):
    arch_config: MiniMaxH3ArchConfig = dataclasses.field(
        default_factory=MiniMaxH3ArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(MINIMAX_H3_PARAM_NAMES_MAPPING))
