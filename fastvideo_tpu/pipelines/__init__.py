"""Pipeline package: build_pipeline entry (reference pipelines/__init__.py:27)."""

from __future__ import annotations

import os

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.models.loader.safetensors_io import load_json_config
from fastvideo_tpu.pipelines.batch import ForwardBatch, TrainingBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.pipeline_registry import resolve_pipeline_cls

logger = init_logger(__name__)

__all__ = [
    "ForwardBatch", "TrainingBatch", "ComposedPipelineBase", "build_pipeline"
]


def build_pipeline(fastvideo_args: FastVideoArgs,
                   pipeline_type: str | None = None) -> ComposedPipelineBase:
    model_path = fastvideo_args.model_path
    index_path = os.path.join(model_path, "model_index.json")
    if not os.path.exists(index_path):
        raise FileNotFoundError(
            f"{index_path} not found — expected a diffusers-format "
            "checkpoint directory (zero-egress: remote HF ids must be "
            "downloaded beforehand)")
    model_index = load_json_config(index_path)
    class_name = model_index.get("_class_name", "WanPipeline")
    dmd = bool(fastvideo_args.pipeline_config is not None and
               fastvideo_args.pipeline_config.dmd_denoising_steps)
    pipeline_cls = resolve_pipeline_cls(class_name,
                                        fastvideo_args.workload_type,
                                        dmd=dmd)
    logger.info("Building pipeline %s for %s", pipeline_cls.__name__,
                class_name)
    return pipeline_cls(model_path, fastvideo_args)
