"""Legacy kwargs <-> typed config conversion.

Analog of /root/reference/fastvideo/api/compat.py: the bridge between the
classic ``from_pretrained(**kwargs)`` / ``generate_video(**kwargs)``
surface and the typed GeneratorConfig / GenerationRequest tree.
"""

from __future__ import annotations

from typing import Any

from fastvideo_tpu.api.schema import (EngineConfig, GenerationRequest,
                                      GeneratorConfig, InputConfig,
                                      OutputConfig, ParallelismConfig,
                                      PipelineSelection,
                                      RequestRuntimeConfig, SamplingConfig)

_SAMPLING_KEYS = {
    "num_videos_per_prompt", "seed", "max_sequence_length", "num_frames",
    "height", "width", "fps", "num_inference_steps", "guidance_scale",
    "guidance_rescale", "boundary_ratio", "use_embedded_guidance", "sigmas",
    "dmd_denoising_steps",
}
_OUTPUT_KEYS = {"output_path", "output_video_name", "save_video",
                "return_frames"}
_RUNTIME_KEYS = {"enable_teacache", "cfg_cache_interval",
                 "return_trajectory_latents", "VSA_sparsity"}
_INPUT_KEYS = {"prompt_path", "image_path", "video_path", "pil_image",
               "latents"}


def legacy_from_pretrained_to_config(model_path: str,
                                     **kwargs: Any) -> GeneratorConfig:
    """Map classic from_pretrained kwargs to a GeneratorConfig."""
    par = ParallelismConfig(
        sp_size=int(kwargs.pop("sp_size", -1) or -1),
        tp_size=int(kwargs.pop("tp_size", -1) or -1),
        dp_size=int(kwargs.pop("dp_size", -1) or -1))
    engine = EngineConfig(num_gpus=int(kwargs.pop("num_gpus", 1)),
                          parallelism=par)
    pipeline = PipelineSelection()
    if "lora_path" in kwargs:
        pipeline.components.lora_path = kwargs.pop("lora_path")
    if "workload_type" in kwargs:
        pipeline.workload_type = kwargs.pop("workload_type")
    cfg = GeneratorConfig(model_path=model_path, engine=engine,
                          pipeline=pipeline)
    return cfg


def legacy_generate_call_to_request(prompt: str | list[str] | None = None,
                                    **kwargs: Any) -> GenerationRequest:
    """Map classic generate_video kwargs to a GenerationRequest; unknown
    keys land in `extensions` so nothing is silently dropped."""
    req = GenerationRequest(prompt=prompt)
    req.negative_prompt = kwargs.pop("negative_prompt", None)
    for key in list(kwargs):
        value = kwargs.pop(key)
        if key in _SAMPLING_KEYS:
            setattr(req.sampling, key, value)
        elif key in _OUTPUT_KEYS:
            setattr(req.output, key, value)
        elif key in _RUNTIME_KEYS:
            setattr(req.runtime, key, value)
        elif key in _INPUT_KEYS:
            setattr(req.inputs, key, value)
        else:
            req.extensions[key] = value
    return req


def request_to_sampling_param(request: GenerationRequest):
    """GenerationRequest -> classic SamplingParam (reference
    api/compat.py request_to_sampling_param)."""
    from fastvideo_tpu.configs.sample import SamplingParam

    param = SamplingParam()
    s, o = request.sampling, request.output
    param.prompt = request.prompt
    if request.negative_prompt is not None:
        param.negative_prompt = request.negative_prompt
    for key in _SAMPLING_KEYS:
        if hasattr(param, key) and getattr(s, key, None) is not None:
            setattr(param, key, getattr(s, key))
    for key in _OUTPUT_KEYS:
        if hasattr(param, key):
            setattr(param, key, getattr(o, key))
    param.image_path = request.inputs.image_path
    param.pil_image = request.inputs.pil_image
    param.return_trajectory_latents = request.runtime.\
        return_trajectory_latents
    param.extra.update(request.extensions)
    return param
