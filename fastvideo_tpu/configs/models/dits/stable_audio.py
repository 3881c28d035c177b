"""Stable Audio Open DiT config + checkpoint mapping.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
stable_audio.py (:27-70). The raw ``stable_audio_tools`` checkpoint
strips a ``model.model.`` prefix and renames LayerNorm gamma/beta; the
reference module names then map to our flattened tree (Sequential
indices -> named linears, ``ff.0/.2`` -> linear_in/linear_out).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig

STABLE_AUDIO_PARAM_NAMES_MAPPING: dict = {
    # mapping applies once per name (first-match-wins), so each rule
    # makes the raw checkpoint's model.model. prefix optional
    r"^(?:model\.model\.)?to_timestep_embed\.0\.(weight|bias|gamma|beta)$":
    r"to_timestep_embed.linear_1.\1",
    r"^(?:model\.model\.)?to_timestep_embed\.2\.(weight|bias)$":
    r"to_timestep_embed.linear_2.\1",
    r"^(?:model\.model\.)?to_cond_embed\.0\.(weight|bias)$":
    r"to_cond_embed.linear_1.\1",
    r"^(?:model\.model\.)?to_cond_embed\.2\.(weight|bias)$":
    r"to_cond_embed.linear_2.\1",
    r"^(?:model\.model\.)?to_global_embed\.0\.(weight|bias)$":
    r"to_global_embed.linear_1.\1",
    r"^(?:model\.model\.)?to_global_embed\.2\.(weight|bias)$":
    r"to_global_embed.linear_2.\1",
    r"^(?:model\.model\.)?transformer\.project_(in|out)\.(.*)$":
    r"project_\1.\2",
    r"^(?:model\.model\.)?transformer\.layers\.(\d+)\.ff\.ff\.0\.(.*)$":
    r"layers.\1.ff.linear_in.\2",
    r"^(?:model\.model\.)?transformer\.layers\.(\d+)\.ff\.ff\.2\.(.*)$":
    r"layers.\1.ff.linear_out.\2",
    r"^(?:model\.model\.)?transformer\.layers\.(\d+)\.(.*?)\.gamma$":
    r"layers.\1.\2.weight",
    r"^(?:model\.model\.)?transformer\.layers\.(\d+)\.(.*?)\.beta$":
    r"layers.\1.\2.bias",
    r"^(?:model\.model\.)?transformer\.layers\.(\d+)\.(.*)$":
    r"layers.\1.\2",
    r"^model\.model\.(.*?)\.gamma$": r"\1.weight",
    r"^model\.model\.(.*?)\.beta$": r"\1.bias",
    r"^model\.model\.(.*)$": r"\1",
}


@dataclasses.dataclass
class StableAudioArchConfig(DiTArchConfig):
    io_channels: int = 64
    embed_dim: int = 1536
    depth: int = 24
    num_attention_heads: int = 24
    cond_token_dim: int = 768
    global_cond_dim: int = 1536
    project_cond_tokens: bool = False
    project_global_cond: bool = True
    qk_norm: str | None = None

    @property
    def hidden_size(self) -> int:
        return self.embed_dim

    @property
    def num_channels_latents(self) -> int:
        return self.io_channels


@dataclasses.dataclass
class StableAudioConfig(ModelConfig):
    arch_config: StableAudioArchConfig = dataclasses.field(
        default_factory=StableAudioArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(STABLE_AUDIO_PARAM_NAMES_MAPPING))
