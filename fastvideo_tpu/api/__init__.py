"""Typed API layer (reference /root/reference/fastvideo/api/)."""

from fastvideo_tpu.api.errors import (ConfigValidationError,
                                      UnknownFieldError, UnknownPresetError)
from fastvideo_tpu.api.presets import (InferencePreset, PresetStageSpec,
                                       get_all_preset_names, get_preset,
                                       get_presets_for_family,
                                       register_preset,
                                       validate_stage_overrides)
from fastvideo_tpu.api.schema import (CompileConfig, ComponentConfig,
                                      EngineConfig, GenerationRequest,
                                      GeneratorConfig, InputConfig,
                                      OffloadConfig, OutputConfig,
                                      ParallelismConfig, PipelineSelection,
                                      QuantizationConfig,
                                      RequestRuntimeConfig, RunConfig,
                                      SamplingConfig, ServeConfig,
                                      ServerConfig, generation_kwargs)

__all__ = [
    "CompileConfig", "ComponentConfig", "ConfigValidationError",
    "EngineConfig", "GenerationRequest", "GeneratorConfig",
    "InferencePreset", "InputConfig", "OffloadConfig", "OutputConfig",
    "ParallelismConfig", "PipelineSelection", "PresetStageSpec",
    "QuantizationConfig", "RequestRuntimeConfig", "RunConfig",
    "SamplingConfig", "ServeConfig", "ServerConfig", "UnknownFieldError",
    "UnknownPresetError", "generation_kwargs", "get_all_preset_names",
    "get_preset", "get_presets_for_family", "register_preset",
    "validate_stage_overrides",
]
