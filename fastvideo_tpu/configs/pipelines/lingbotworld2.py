"""LingBot-World 2 causal-fast pipeline config
(reference configs/pipelines/lingbotworld2.py)."""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.pipelines.wan import WanT2V480PConfig
from fastvideo_tpu.models.dits.lingbotworld2 import (
    LingBotWorld2CausalFastVideoConfig)


@dataclasses.dataclass
class LingBotWorld2CausalFastI2V480PConfig(WanT2V480PConfig):
    dit_config: LingBotWorld2CausalFastVideoConfig = dataclasses.field(
        default_factory=LingBotWorld2CausalFastVideoConfig)
    flow_shift: float | None = 10.0

    def __post_init__(self) -> None:
        # the released checkpoint ships the OFFICIAL Wan VAE key layout
        from fastvideo_tpu.configs.models.vaes.wan import (
            OfficialWanVAEConfig, WanVAEConfig)

        if type(self.vae_config) is WanVAEConfig:
            self.vae_config = OfficialWanVAEConfig()
