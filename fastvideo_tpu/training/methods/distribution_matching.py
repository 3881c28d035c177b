"""Distribution-matching methods (reference train/methods/distribution_matching/).

``dmd2`` (dmd2.py) and ``self_forcing`` (self_forcing.py) wrap the round-1
three-role pipelines behind the plugin protocol.
"""

from __future__ import annotations

from fastvideo_tpu.training.methods.base import (PipelineMethod,
                                                 register_method)
from fastvideo_tpu.training.run_config import (TrainRunConfig,
                                               build_training_args,
                                               build_transformer)


def _dmd_config(cfg: TrainRunConfig):
    from fastvideo_tpu.training.distillation_pipeline import DMDConfig

    return DMDConfig(
        dmd_denoising_steps=tuple(cfg.dmd.dmd_denoising_steps),
        real_score_guidance_scale=cfg.dmd.real_score_guidance_scale,
        dfake_gen_update_ratio=cfg.dmd.dfake_gen_update_ratio,
        timestep_shift=cfg.dmd.timestep_shift)


@register_method
class DMD2Method(PipelineMethod):
    """Distribution Matching Distillation v2 (generator/real/fake roles)."""

    name = "dmd2"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "DMD2Method":
        from fastvideo_tpu.training.distillation_pipeline import (
            DMD2DistillationPipeline)

        targs = build_training_args(cfg)
        generator = build_transformer(cfg.model)
        real_score = build_transformer(cfg.model)
        fake_score = build_transformer(cfg.model)
        return cls(DMD2DistillationPipeline(generator, real_score,
                                            fake_score, targs,
                                            _dmd_config(cfg)))


@register_method
class SelfForcingMethod(PipelineMethod):
    """Causal self-forcing distillation (rolling-KV autoregressive rollout)."""

    name = "self_forcing"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "SelfForcingMethod":
        from fastvideo_tpu.training.self_forcing_pipeline import (
            SelfForcingDistillationPipeline)

        targs = build_training_args(cfg)
        generator = build_transformer(cfg.model)
        real_score = build_transformer(cfg.model)
        fake_score = build_transformer(cfg.model)
        steps = cfg.method_config.get("denoise_steps",
                                      cfg.dmd.dmd_denoising_steps)
        return cls(SelfForcingDistillationPipeline(
            generator, real_score, fake_score, targs, _dmd_config(cfg),
            denoise_steps=tuple(steps)))
