"""YAML-configured training entrypoint.

Analog of /root/reference/fastvideo/train/entrypoint/train.py:120
(``torchrun -m fastvideo.train.entrypoint.train --config cfg.yaml``) —
here a single JAX controller drives the whole mesh, so the entrypoint is
plain ``python -m fastvideo_tpu.entrypoints.cli.train --config cfg.yaml``.

Config tree (parsed with the typed api parser; unknown keys are errors):

    method: sft | dmd2
    model:
      pretrained_model_path: /path/to/Diffusers-dir   # transformer/ inside
      dit_precision: bf16
    data:
      path: /path/to/parquet
      batch_size: 1
      text_drop_rate: 0.0
    training:                # any TrainingArgs field
      learning_rate: 1e-5
      max_train_steps: 1000
      num_gpus: 8
      dp_size: 2
      sp_size: 4
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


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


def load_train_config(path: str) -> TrainRunConfig:
    from fastvideo_tpu.api.parser import load_config_file

    return load_config_file(TrainRunConfig, path)


def _build_transformer(spec: ModelSpec):
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
                                model_config=dit_config)


def build_from_config(cfg: TrainRunConfig):
    """Instantiate the training pipeline + dataloader from a parsed config."""
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.models.schedulers.flow_match_euler import (
        FlowMatchEulerDiscreteScheduler)

    args_fields = {f.name for f in dataclasses.fields(TrainingArgs)}
    unknown = set(cfg.training) - args_fields
    if unknown:
        raise ValueError(f"Unknown training fields: {sorted(unknown)}")
    targs = TrainingArgs(**cfg.training)

    scheduler = FlowMatchEulerDiscreteScheduler(shift=cfg.model.flow_shift)
    scheduler.set_timesteps(1000)

    if cfg.method == "sft":
        from fastvideo_tpu.training.training_pipeline import TrainingPipeline

        transformer = _build_transformer(cfg.model)
        pipeline = TrainingPipeline(transformer, scheduler, targs)
    elif cfg.method == "dmd2":
        from fastvideo_tpu.training.distillation_pipeline import (
            DMD2DistillationPipeline, DMDConfig)

        generator = _build_transformer(cfg.model)
        real_score = _build_transformer(cfg.model)
        fake_score = _build_transformer(cfg.model)
        dmd = DMDConfig(
            dmd_denoising_steps=tuple(cfg.dmd.dmd_denoising_steps),
            real_score_guidance_scale=cfg.dmd.real_score_guidance_scale,
            dfake_gen_update_ratio=cfg.dmd.dfake_gen_update_ratio,
            timestep_shift=cfg.dmd.timestep_shift)
        pipeline = DMD2DistillationPipeline(generator, real_score,
                                            fake_score, targs, dmd)
    else:
        raise ValueError(f"Unknown training method {cfg.method!r}; "
                         "supported: sft, dmd2")

    dataloader = None
    if cfg.data.path:
        from fastvideo_tpu.dataset.parquet import build_parquet_dataloader

        dataloader = build_parquet_dataloader(
            cfg.data.path, batch_size=cfg.data.batch_size,
            accum=targs.gradient_accumulation_steps,
            text_drop_rate=cfg.data.text_drop_rate, seed=targs.seed)
    return pipeline, dataloader


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser("fastvideo_tpu train")
    parser.add_argument("--config", required=True,
                        help="YAML/JSON training config")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint")
    ns = parser.parse_args(argv)
    cfg = load_train_config(ns.config)
    pipeline, dataloader = build_from_config(cfg)
    if ns.resume:
        pipeline.resume_from_checkpoint()
    if dataloader is None:
        raise SystemExit("data.path is required to run training")
    logger.info("Starting %s training (%d steps)", cfg.method,
                pipeline.args.max_train_steps)
    pipeline.train(dataloader)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
