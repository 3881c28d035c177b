"""FastVideoArgs / TrainingArgs: master runtime configuration.

Analog of /root/reference/fastvideo/fastvideo_args.py:82,888. Field names
match the reference where they exist so user configs port unchanged; GPU-only
knobs (num_gpus -> mesh sizes, FSDP device flags) map onto the TPU mesh.
"""

from __future__ import annotations

import argparse
import contextvars
import dataclasses
from typing import Any

from fastvideo_tpu.parallel.mesh import MeshConfig


@dataclasses.dataclass
class FastVideoArgs:
    model_path: str = ""
    # parallelism (reference: num_gpus/tp_size/sp_size)
    num_gpus: int = 1
    tp_size: int = 1
    sp_size: int = 1
    dp_size: int = -1
    dist_timeout: int | None = None

    # mode
    inference_mode: bool = True
    workload_type: str = "t2v"

    # precision
    precision: str = "bf16"
    vae_precision: str = "fp32"
    vae_decode_precision: str = "bf16"
    text_encoder_precision: str = "fp32"

    # attention
    attention_backend: str | None = None

    # transformer quantization ("int8" | "int8_w8a8" | "int8-weight-only");
    # TPU analog of the reference's FastWan-QAD FP8 serving path (its 1.8 s
    # headline, README.md:12) — the MXU runs int8 at 2x bf16 throughput.
    # None = bf16. Also settable via FASTVIDEO_TRANSFORMER_QUANT.
    transformer_quant: str | None = None

    # text-encoder quantization; "int8-weight-only" halves UMT5-XXL's
    # upload + resident HBM with host-side quantize-at-load (analog of the
    # reference's per-encoder text_encoder_precisions, e.g. fp8 --
    # configs/pipelines/base.py:70). Also settable via
    # FASTVIDEO_TEXT_ENCODER_QUANT.
    text_encoder_quant: str | None = None

    # pipeline selection
    pipeline_type: str | None = None

    # scheduler / denoise knobs
    flow_shift: float | None = None
    num_inference_steps: int | None = None

    # LoRA
    lora_path: str | None = None
    lora_nickname: str = "default"

    # VAE tiling / SP
    vae_tiling: bool = False
    vae_sp: bool = False

    # compile / cache
    enable_jit_cache: bool = True
    # sparse attention knobs (VSA/STA)
    VSA_sparsity: float = 0.0

    # offload flags kept for API compat (mostly no-ops on HBM-resident TPU)
    dit_cpu_offload: bool = False
    # snap request shapes to canonical buckets (serving compile control)
    shape_bucketing: bool = False
    text_encoder_cpu_offload: bool = False
    vae_cpu_offload: bool = False

    # free-form model overrides
    pipeline_config: Any = None
    override_args: dict[str, Any] = dataclasses.field(default_factory=dict)

    def mesh_config(self) -> MeshConfig:
        dp = self.dp_size
        if dp == -1:
            # the world is num_gpus ("gpus" = chips), not all host devices
            dp = max(1, self.num_gpus // (self.sp_size * self.tp_size))
        return MeshConfig(dp_size=dp, sp_size=self.sp_size,
                          tp_size=self.tp_size)

    @classmethod
    def from_kwargs(cls, **kwargs) -> "FastVideoArgs":
        field_names = {f.name for f in dataclasses.fields(cls)}
        args = cls(**{k: v for k, v in kwargs.items() if k in field_names})
        args.override_args = {
            k: v for k, v in kwargs.items() if k not in field_names
        }
        # reference semantics: num_gpus defines the world; sp fills it
        if args.num_gpus > 1 and args.sp_size == 1 and args.tp_size == 1 \
                and args.dp_size == -1:
            args.sp_size = args.num_gpus
        return args

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        for f in dataclasses.fields(FastVideoArgs):
            if f.name in ("override_args", "pipeline_config"):
                continue
            name = "--" + f.name.replace("_", "-")
            ftype = f.type if isinstance(f.type, type) else str
            if ftype is bool or f.type in ("bool",):
                parser.add_argument(name, action="store_true",
                                    default=argparse.SUPPRESS)
            else:
                parser.add_argument(name, default=argparse.SUPPRESS)
        return parser


@dataclasses.dataclass
class TrainingArgs(FastVideoArgs):
    inference_mode: bool = False
    # data
    data_path: str = ""
    dataloader_num_workers: int = 2
    train_batch_size: int = 1
    gradient_accumulation_steps: int = 1
    max_train_steps: int = 1000
    # optimizer
    learning_rate: float = 1e-5
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    weight_decay: float = 1e-4
    max_grad_norm: float = 1.0
    betas: tuple[float, float] = (0.9, 0.999)
    # VSA sparsity ramp (reference training_pipeline.py:557-563): sparsity
    # grows by VSA_decay_rate every VSA_decay_interval_steps up to the
    # FastVideoArgs-level VSA_sparsity target. rate/interval <= 0 = jump
    # straight to the target.
    VSA_decay_rate: float = 0.0
    VSA_decay_interval_steps: int = 0
    # timestep sampling
    weighting_scheme: str = "uniform"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mode_scale: float = 1.29
    # checkpointing
    output_dir: str = "outputs"
    checkpointing_steps: int = 500
    resume_from_checkpoint: str | None = None
    # activation checkpointing / remat
    selective_checkpointing: str = "full"
    # validation
    validation_steps: int = 0
    # tracking ("jsonl" local backend by default; "wandb" when installed)
    trackers: tuple[str, ...] = ()
    tracker_project_name: str | None = None
    wandb_run_name: str | None = None
    seed: int = 42
    # sp-aware training
    sp_world_size: int = 1


_current_args: contextvars.ContextVar[FastVideoArgs | None] = (
    contextvars.ContextVar("fastvideo_args", default=None))


def get_current_fastvideo_args() -> FastVideoArgs:
    args = _current_args.get()
    if args is None:
        raise RuntimeError("FastVideoArgs not set")
    return args


def set_current_fastvideo_args(args: FastVideoArgs):
    _current_args.set(args)
