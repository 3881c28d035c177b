"""Distribution-matching methods (reference train/methods/distribution_matching/).

``dmd2`` (dmd2.py), ``self_forcing`` (self_forcing.py) and
``streaming_long_tuning`` (streaming_long_tuning.py) wrap the three-role
pipelines behind the plugin protocol.
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


@register_method
class StreamingLongTuningMethod(PipelineMethod):
    """LongLive-style multi-stage streaming self-forcing.

    Config keys (``method_config``):
      - ``multi_phased_distill_schedule``: compact string
        (``"700:21,3000:240"``) or list-of-dicts stage schedule
      - ``streaming_chunk_size`` / ``num_latent_t`` defaults
      - ``denoise_steps``: generator denoise timesteps
    """

    name = "streaming_long_tuning"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "StreamingLongTuningMethod":
        from fastvideo_tpu.training.streaming_long_pipeline import (
            StreamingLongTuningPipeline, parse_multi_phased_distill_schedule)

        targs = build_training_args(cfg)
        generator = build_transformer(cfg.model)
        real_score = build_transformer(cfg.model)
        fake_score = build_transformer(cfg.model)
        mc = cfg.method_config
        steps = mc.get("denoise_steps", cfg.dmd.dmd_denoising_steps)
        chunk = mc.get("streaming_chunk_size")
        stages = parse_multi_phased_distill_schedule(
            mc.get("multi_phased_distill_schedule"),
            default_num_latent_t=int(mc.get("num_latent_t", 8)),
            default_streaming_chunk_size=chunk,
            default_streaming_max_length=mc.get("streaming_max_length"))
        return cls(StreamingLongTuningPipeline(
            generator, real_score, fake_score, targs, _dmd_config(cfg),
            denoise_steps=tuple(steps), stages=stages,
            default_chunk_size=chunk))
