"""Typed API config tree.

Analog of /root/reference/fastvideo/api/schema.py (:8-317), re-keyed for
TPU: ``CompileConfig``'s torch.compile knobs become XLA/jit knobs
(persistent compilation cache, donation, remat policy), ``OffloadConfig``
targets host RAM instead of CPU-pinned CUDA buffers, and
``ParallelismConfig`` speaks mesh axes (dp/sp/tp) instead of
tp/hsdp dims. Field and class names follow the reference where the
concept carries over so user configs port mechanically.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Literal


@dataclass
class ServerConfig:
    host: str = "0.0.0.0"
    port: int = 8000
    output_dir: str = "outputs/"


@dataclass
class ParallelismConfig:
    """Mesh axes. -1 = infer from num_chips (sp fills the world)."""

    dp_size: int = -1
    sp_size: int = -1
    tp_size: int = -1


@dataclass
class OffloadConfig:
    """Host-RAM offload of idle components between stages."""

    dit: bool = False
    text_encoder: bool = False
    image_encoder: bool = False
    vae: bool = False


@dataclass
class CompileConfig:
    """XLA/jit knobs (the TPU analog of reference CompileConfig)."""

    enabled: bool = True
    persistent_cache: bool = True
    cache_dir: str | None = None
    donate_inputs: bool = True
    remat_policy: Literal["none", "full", "dots"] = "none"
    extras: dict[str, Any] = field(default_factory=dict)


@dataclass
class QuantizationConfig:
    text_encoder_quant: str | None = None
    transformer_quant: str | None = None  # "int8" | "int8-weight-only"


@dataclass
class EngineConfig:
    num_gpus: int = 1  # chips; name kept for reference parity
    execution_backend: Literal["local", "mp", "ray"] = "local"
    parallelism: ParallelismConfig = field(default_factory=ParallelismConfig)
    offload: OffloadConfig = field(default_factory=OffloadConfig)
    compile: CompileConfig = field(default_factory=CompileConfig)
    enable_stage_verification: bool = True
    disable_autocast: bool = False
    quantization: QuantizationConfig | None = None


@dataclass
class ComponentConfig:
    config_root: str | None = None
    pipeline_config_path: str | None = None
    text_encoder_weights: str | None = None
    transformer_weights: str | None = None
    transformer_2_weights: str | None = None
    vae_weights: str | None = None
    lora_path: str | None = None
    override_pipeline_cls_name: str | None = None
    override_transformer_cls_name: str | None = None


@dataclass
class PipelineSelection:
    workload_type: Literal["t2v", "i2v", "v2v", "t2i", "i2i"] | None = None
    preset: str | None = None
    preset_version: int | None = None
    components: ComponentConfig = field(default_factory=ComponentConfig)
    vae_tiling: bool | None = None
    preset_overrides: dict[str, Any] = field(default_factory=dict)
    experimental: dict[str, Any] = field(default_factory=dict)


@dataclass
class GeneratorConfig:
    model_path: str = ""
    revision: str | None = None
    engine: EngineConfig = field(default_factory=EngineConfig)
    pipeline: PipelineSelection = field(default_factory=PipelineSelection)


@dataclass
class InputConfig:
    prompt_path: str | None = None
    image_path: str | list[str] | None = None
    video_path: str | list[str] | None = None
    pil_image: Any | None = None
    latents: Any | None = None


@dataclass
class SamplingConfig:
    num_videos_per_prompt: int = 1
    seed: int = 1024
    max_sequence_length: int | None = None
    num_frames: int = 81
    height: int = 480
    width: int = 832
    fps: int = 16
    num_inference_steps: int = 50
    guidance_scale: float = 5.0
    guidance_rescale: float = 0.0
    boundary_ratio: float | None = None
    use_embedded_guidance: bool | None = None
    sigmas: list[float] | None = None
    dmd_denoising_steps: list[int] | None = None


@dataclass
class RequestRuntimeConfig:
    enable_teacache: bool = False
    cfg_cache_interval: int = 1
    return_trajectory_latents: bool = False
    VSA_sparsity: float | None = None


@dataclass
class OutputConfig:
    output_path: str = "outputs/"
    output_video_name: str | None = None
    save_video: bool = True
    return_frames: bool = True


@dataclass
class GenerationRequest:
    prompt: str | list[str] | None = None
    negative_prompt: str | None = None
    inputs: InputConfig = field(default_factory=InputConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    runtime: RequestRuntimeConfig = field(default_factory=RequestRuntimeConfig)
    output: OutputConfig = field(default_factory=OutputConfig)
    stage_overrides: dict[str, Any] = field(default_factory=dict)
    extensions: dict[str, Any] = field(default_factory=dict)


@dataclass
class RunConfig:
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    request: GenerationRequest = field(default_factory=GenerationRequest)


@dataclass
class ServeConfig:
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    server: ServerConfig = field(default_factory=ServerConfig)
    default_request: GenerationRequest = field(
        default_factory=GenerationRequest)


def generation_kwargs(request: GenerationRequest) -> dict[str, Any]:
    """Flatten a GenerationRequest into VideoGenerator.generate_video
    kwargs (the reference's _build_generation_kwargs)."""
    s, o, r = request.sampling, request.output, request.runtime
    kwargs: dict[str, Any] = dict(
        negative_prompt=request.negative_prompt,
        num_videos_per_prompt=s.num_videos_per_prompt,
        seed=s.seed,
        num_frames=s.num_frames,
        height=s.height,
        width=s.width,
        fps=s.fps,
        num_inference_steps=s.num_inference_steps,
        guidance_scale=s.guidance_scale,
        guidance_rescale=s.guidance_rescale,
        boundary_ratio=s.boundary_ratio,
        dmd_denoising_steps=s.dmd_denoising_steps,
        output_path=o.output_path,
        output_video_name=o.output_video_name,
        save_video=o.save_video,
        return_frames=o.return_frames,
        return_trajectory_latents=r.return_trajectory_latents,
        image_path=request.inputs.image_path,
    )
    if r.cfg_cache_interval and r.cfg_cache_interval > 1:
        kwargs["cfg_cache_interval"] = r.cfg_cache_interval
    if r.VSA_sparsity is not None:
        kwargs["VSA_sparsity"] = r.VSA_sparsity
    if r.enable_teacache:
        kwargs["enable_teacache"] = True
    if s.sigmas is not None:
        kwargs["sigmas"] = s.sigmas
    if s.max_sequence_length is not None:
        kwargs["max_sequence_length"] = s.max_sequence_length
    if s.use_embedded_guidance is not None:
        kwargs["use_embedded_guidance"] = s.use_embedded_guidance
    kwargs.update(request.extensions)
    return {k: v for k, v in kwargs.items() if v is not None}


def asdict_tree(obj) -> dict[str, Any]:
    return dataclasses.asdict(obj)


__all__ = [
    "CompileConfig", "ComponentConfig", "EngineConfig", "GenerationRequest",
    "GeneratorConfig", "InputConfig", "OffloadConfig", "OutputConfig",
    "ParallelismConfig", "PipelineSelection", "QuantizationConfig",
    "RequestRuntimeConfig", "RunConfig", "SamplingConfig", "ServeConfig",
    "ServerConfig", "asdict_tree", "generation_kwargs",
]
