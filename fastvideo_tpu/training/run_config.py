"""Training run config (the YAML schema) + shared component builders.

Analog of the reference's train config tree
(/root/reference/fastvideo/train/entrypoint/train.py + configs): a typed
dataclass parsed by the api parser, with ``method`` resolved through the
plugin registry (``training.methods``) instead of an if/elif fork.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ModelSpec:
    pretrained_model_path: str = ""
    dit_precision: str = "fp32"
    flow_shift: float = 3.0


@dataclass
class DataSpec:
    path: str = ""
    batch_size: int = 1
    text_drop_rate: float = 0.0


@dataclass
class DMDSpec:
    dmd_denoising_steps: list[int] = field(
        default_factory=lambda: [1000, 757, 522])
    real_score_guidance_scale: float = 3.5
    dfake_gen_update_ratio: int = 5
    timestep_shift: float = 8.0


@dataclass
class TrainRunConfig:
    method: str = "sft"
    model: ModelSpec = field(default_factory=ModelSpec)
    data: DataSpec = field(default_factory=DataSpec)
    training: dict[str, Any] = field(default_factory=dict)
    dmd: DMDSpec = field(default_factory=DMDSpec)
    # method-specific free-form options, passed to Method.from_config
    # (e.g. kd: {t_list: [...], teacher_path: ...}).
    method_config: dict[str, Any] = field(default_factory=dict)
    # named callbacks (grad_clip / validation / ema builtins, or dotted
    # _target_ classes; reference train/callbacks/)
    callbacks: dict[str, Any] = field(default_factory=dict)


def load_train_config(path: str) -> TrainRunConfig:
    from fastvideo_tpu.api.parser import load_config_file

    return load_config_file(TrainRunConfig, path)


def build_training_args(cfg: TrainRunConfig):
    from fastvideo_tpu.fastvideo_args import TrainingArgs

    args_fields = {f.name for f in dataclasses.fields(TrainingArgs)}
    unknown = set(cfg.training) - args_fields
    if unknown:
        raise ValueError(f"Unknown training fields: {sorted(unknown)}")
    return TrainingArgs(**cfg.training)


def build_transformer(spec: ModelSpec,
                      arch_overrides: dict[str, Any] | None = None):
    """Load the DiT from a diffusers-format dir (transformer/ subdir)."""
    from fastvideo_tpu.models.loader.component_loader import (
        load_model_component)
    from fastvideo_tpu.registry import get_pipeline_config_cls_for_name

    config_cls = get_pipeline_config_cls_for_name(spec.pretrained_model_path)
    dit_config = None
    if config_cls is not None:
        dit_config = config_cls(
            model_path=spec.pretrained_model_path).dit_config
    tdir = os.path.join(spec.pretrained_model_path, "transformer")
    return load_model_component(tdir, precision=spec.dit_precision,
                                model_config=dit_config,
                                arch_overrides=arch_overrides)


def build_dataloader(cfg: TrainRunConfig, training_args):
    if not cfg.data.path:
        return None
    from fastvideo_tpu.dataset.parquet import build_parquet_dataloader

    return build_parquet_dataloader(
        cfg.data.path, batch_size=cfg.data.batch_size,
        accum=training_args.gradient_accumulation_steps,
        text_drop_rate=cfg.data.text_drop_rate, seed=training_args.seed)
