"""LingBot-Video DiT config.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
lingbot_video.py (:28-63). Checkpoint names match the module tree except
the ``time_modulation`` / ``norm_out_modulation`` Sequential index.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig

LINGBOT_VIDEO_PARAM_NAMES_MAPPING: dict = {
    r"^time_modulation\.1\.(.*)$": r"time_modulation.\1",
    r"^norm_out_modulation\.1\.(.*)$": r"norm_out_modulation.\1",
}


@dataclasses.dataclass
class LingBotVideoArchConfig(DiTArchConfig):
    patch_size: tuple[int, int, int] = (1, 2, 2)
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 2048
    num_attention_heads: int = 16
    depth: int = 24
    intermediate_size: int = 6144
    text_dim: int = 2560
    freq_dim: int = 256
    norm_eps: float = 1e-6
    rope_theta: float = 256.0
    axes_dims: tuple[int, int, int] = (32, 48, 48)
    axes_lens: tuple[int, int, int] = (8192, 1024, 1024)
    qkv_bias: bool = False
    out_bias: bool = True
    patch_embed_bias: bool = True
    timestep_mlp_bias: bool = True
    num_experts: int = 0
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 512
    decoder_sparse_step: int = 1
    mlp_only_layers: tuple[int, ...] = ()
    n_shared_experts: int | None = None
    score_func: str = "sigmoid"
    norm_topk_prob: bool = True
    n_group: int | None = None
    topk_group: int | None = None
    routed_scaling_factor: float = 1.0

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels

    @property
    def attention_head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclasses.dataclass
class LingBotVideoConfig(ModelConfig):
    arch_config: LingBotVideoArchConfig = dataclasses.field(
        default_factory=LingBotVideoArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(LINGBOT_VIDEO_PARAM_NAMES_MAPPING))
