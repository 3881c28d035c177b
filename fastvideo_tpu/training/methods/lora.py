"""LoRA fine-tuning: train low-rank adapters with the base model frozen.

Analog of the reference's LoRA training path
(/root/reference/fastvideo/pipelines/lora_pipeline.py:152-206 — grad is
enabled only on lora_A/lora_B with the base weights frozen). TPU-native
shape: instead of per-tensor ``requires_grad`` flags, the model is SPLIT
into a trainable LoRA state and a frozen remainder (``nnx.split`` with a
path filter); the optimizer and the jitted train step only ever see the
adapter pytree, so optimizer state is rank*(in+out) per layer, not the
full model, and the frozen base rides through the step as closure
constants XLA hoists once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.layers.lora import LoRALinear
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.training.methods.base import PipelineMethod, register_method
from fastvideo_tpu.training.run_config import (TrainRunConfig,
                                               build_training_args,
                                               build_transformer)
from fastvideo_tpu.training.training_pipeline import TrainingPipeline

logger = init_logger(__name__)

# trainable-adapter filter: the lora_A/lora_B Params added by
# convert_to_lora_layers; everything else is the frozen base
LORA_FILTER = nnx.Any(nnx.PathContains("lora_A"), nnx.PathContains("lora_B"))


def init_lora_for_training(model: nnx.Module, seed: int = 0) -> int:
    """Standard LoRA train init (Hu et al.): A ~ N(0, 1/in_features),
    B = 0, adapter active. B=0 keeps step-0 output identical to the base
    model; A random makes dL/dB nonzero so training can start."""
    key = jax.random.PRNGKey(seed)
    n = 0

    def walk(mod):
        nonlocal key, n
        for name, child in list(vars(mod).items()):
            if str(name).startswith("_"):
                continue
            if isinstance(child, LoRALinear):
                key, sub = jax.random.split(key)
                a = jax.random.normal(sub, child.lora_A.value.shape,
                                      jnp.float32)
                a = a / jnp.sqrt(float(child.in_features))
                child.lora_A.value = a.astype(child.lora_A.value.dtype)
                child.lora_B.value = jnp.zeros_like(child.lora_B.value)
                child.lora_active = True
                child.merged = False
                n += 1
            if isinstance(child, (nnx.Module, list, nnx.List)):
                items = (child if isinstance(child, (list, nnx.List))
                         else [child])
                for item in items:
                    if isinstance(item, nnx.Module):
                        walk(item)

    walk(model)
    return n


class LoRATrainingPipeline(TrainingPipeline):
    """Flow-matching SFT where only LoRA adapters receive gradients."""

    def __init__(self, transformer, scheduler, training_args, *,
                 rank: int = 16, alpha: float | None = None,
                 target_modules=None, init_seed: int = 0, mesh=None):
        from fastvideo_tpu.pipelines.lora_pipeline import (
            DEFAULT_TARGET_MODULES, convert_to_lora_layers)

        targets = tuple(target_modules or DEFAULT_TARGET_MODULES)
        n = convert_to_lora_layers(transformer, targets, rank=rank,
                                   alpha=alpha)
        if n == 0:
            raise ValueError(
                f"no Linear matched LoRA target_modules {targets}")
        init_lora_for_training(transformer, seed=init_seed)
        super().__init__(transformer, scheduler, training_args, mesh=mesh)
        logger.info("LoRA training: %d adapted linears, rank=%d "
                    "(%d trainable params)", n, rank,
                    sum(x.size for x in jax.tree.leaves(self.state.params)))

    def _split_model(self, transformer):
        graphdef, lora, rest = nnx.split(transformer, LORA_FILTER, ...)
        self._frozen = rest
        return graphdef, lora


@register_method
class LoRAFinetuneMethod(PipelineMethod):
    """``method: lora_finetune`` — SFT objective, adapter-only updates.

    method_config: {rank, alpha, target_modules, init_seed}.
    """

    name = "lora_finetune"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "LoRAFinetuneMethod":
        from fastvideo_tpu.models.schedulers.flow_match_euler import (
            FlowMatchEulerDiscreteScheduler)

        targs = build_training_args(cfg)
        scheduler = FlowMatchEulerDiscreteScheduler(
            shift=cfg.model.flow_shift)
        scheduler.set_timesteps(1000)
        transformer = build_transformer(cfg.model)
        mc = dict(cfg.method_config)
        pipe = LoRATrainingPipeline(
            transformer, scheduler, targs,
            rank=int(mc.get("rank", 16)),
            alpha=mc.get("alpha"),
            target_modules=mc.get("target_modules"),
            init_seed=int(mc.get("init_seed", 0)))
        return cls(pipe)
