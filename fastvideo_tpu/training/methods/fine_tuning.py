"""Fine-tuning methods (reference train/methods/fine_tuning/).

``sft`` wraps the round-1 flow-matching SFT pipeline behind the plugin
protocol (reference finetune.py); ``dfsft`` is data-free SFT — the clean
latents come from the frozen base model's own few-step samples instead of a
dataset (reference dfsft.py: self-generated targets preserve the base
distribution while adapting, e.g., for LoRA-style personalization).
"""

from __future__ import annotations

from fastvideo_tpu.training.methods.base import (PipelineMethod,
                                                 TrainingMethod,
                                                 register_method)
from fastvideo_tpu.training.run_config import (TrainRunConfig,
                                               build_training_args,
                                               build_transformer)


@register_method
class SFTMethod(PipelineMethod):
    """Flow-matching supervised fine-tuning."""

    name = "sft"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "SFTMethod":
        from fastvideo_tpu.models.schedulers.flow_match_euler import (
            FlowMatchEulerDiscreteScheduler)
        from fastvideo_tpu.training.training_pipeline import TrainingPipeline

        targs = build_training_args(cfg)
        scheduler = FlowMatchEulerDiscreteScheduler(
            shift=cfg.model.flow_shift)
        scheduler.set_timesteps(1000)
        transformer = build_transformer(cfg.model)
        return cls(TrainingPipeline(transformer, scheduler, targs))


@register_method
class DFSFTMethod(TrainingMethod):
    """Data-free SFT: distill the model onto its own generations.

    Reference semantics (train/methods/fine_tuning/dfsft.py): roll the
    frozen base model a few steps to produce clean latents, then run the
    standard flow-matching SFT loss against those latents. Text embeddings
    still come from the dataloader; the video latents are ignored.
    """

    name = "dfsft"

    def __init__(self, pipeline, base_params, sample_steps=(1000, 757, 522)):
        import jax

        self.pipeline = pipeline
        self.base_params = base_params
        self.sample_steps = tuple(sample_steps)
        self._rollout = jax.jit(self._make_rollout())

    @property
    def args(self):
        return self.pipeline.args

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "DFSFTMethod":
        import jax
        import jax.numpy as jnp

        from fastvideo_tpu.models.schedulers.flow_match_euler import (
            FlowMatchEulerDiscreteScheduler)
        from fastvideo_tpu.training.training_pipeline import TrainingPipeline

        targs = build_training_args(cfg)
        scheduler = FlowMatchEulerDiscreteScheduler(
            shift=cfg.model.flow_shift)
        scheduler.set_timesteps(1000)
        transformer = build_transformer(cfg.model)
        pipeline = TrainingPipeline(transformer, scheduler, targs)
        # Frozen copy of the base weights as the self-distillation teacher.
        base_params = jax.tree.map(jnp.copy, pipeline.state.params)
        steps = cfg.method_config.get("sample_steps", [1000, 757, 522])
        return cls(pipeline, base_params, steps)

    def _make_rollout(self):
        import jax
        import jax.numpy as jnp

        graphdef = self.pipeline.graphdef
        steps = list(self.sample_steps)
        sigmas = [t / 1000.0 for t in steps] + [0.0]

        def rollout(base_params, noise, embeds, key):
            from flax import nnx

            model = nnx.merge(graphdef, base_params)
            lat = noise
            keys = jax.random.split(key, len(steps))
            for i, t_int in enumerate(steps):
                t = jnp.full((noise.shape[0],), float(t_int), jnp.float32)
                v = model(lat.astype(jnp.bfloat16), embeds.astype(
                    jnp.bfloat16), t).astype(jnp.float32)
                x0 = lat - sigmas[i] * v
                if sigmas[i + 1] > 0:
                    fresh = jax.random.normal(keys[i], lat.shape, lat.dtype)
                    lat = (1 - sigmas[i + 1]) * x0 + sigmas[i + 1] * fresh
                else:
                    lat = x0
            return jax.lax.stop_gradient(lat)

        return rollout

    def train(self, dataloader, max_steps=None, **kwargs) -> None:
        import jax
        import numpy as np

        from fastvideo_tpu.logger import init_logger
        logger = init_logger(__name__)

        max_steps = max_steps or self.args.max_train_steps
        it = iter(dataloader)
        rng = jax.random.PRNGKey(self.args.seed + 1)
        while self.pipeline.state.step < max_steps:
            try:
                latents, embeds = next(it)
            except StopIteration:
                it = iter(dataloader)
                latents, embeds = next(it)
            latents = np.asarray(latents, np.float32)
            embeds = np.asarray(embeds, np.float32)
            rng, k = jax.random.split(rng)
            # self-generated targets per microbatch
            gen = []
            for a in range(latents.shape[0]):
                noise = jax.random.normal(
                    jax.random.fold_in(k, a), latents[a].shape)
                gen.append(np.asarray(
                    self._rollout(self.base_params, noise, embeds[a], k)))
            metrics = self.pipeline.train_one_step(np.stack(gen), embeds)
            self.pipeline.tracker.log(metrics, self.pipeline.state.step)
            if self.pipeline.state.step % 10 == 0:
                logger.info("dfsft step %d loss %.4f", metrics["step"],
                            metrics["loss"])

    def save_checkpoint(self) -> None:
        self.pipeline.save_checkpoint()

    def resume_from_checkpoint(self, step=None) -> None:
        self.pipeline.resume_from_checkpoint(step)
