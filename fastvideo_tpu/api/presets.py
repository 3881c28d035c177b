"""Inference presets: named per-family sampling defaults.

Analog of /root/reference/fastvideo/api/presets.py (:38-261): frozen
preset dataclasses in a (family, name, version) registry, with
stage-override validation. Built-in presets cover the shipped model
families (Wan 2.1/2.2, FastWan DMD, HunyuanVideo).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from fastvideo_tpu.api.errors import ConfigValidationError, UnknownPresetError


@dataclass(frozen=True)
class PresetStageSpec:
    name: str
    kind: str
    description: str = ""
    allowed_overrides: frozenset[str] = field(default_factory=frozenset)


@dataclass(frozen=True)
class InferencePreset:
    name: str
    version: int
    model_family: str
    description: str = ""
    workload_type: str | None = None
    stage_schemas: tuple[PresetStageSpec, ...] = ()
    defaults: dict[str, Any] = field(default_factory=dict)
    stage_defaults: dict[str, dict[str, Any]] = field(default_factory=dict)


_PRESET_REGISTRY: dict[tuple[str, str, int], InferencePreset] = {}


def register_preset(preset: InferencePreset) -> None:
    key = (preset.model_family, preset.name, preset.version)
    if key in _PRESET_REGISTRY:
        raise ValueError(f"Duplicate preset registration: {key}")
    _PRESET_REGISTRY[key] = preset


def get_preset(model_family: str, name: str,
               version: int | None = None) -> InferencePreset:
    if version is not None:
        preset = _PRESET_REGISTRY.get((model_family, name, version))
        if preset is None:
            raise UnknownPresetError(
                "pipeline.preset",
                f"No preset {name!r} v{version} for family "
                f"{model_family!r}; registered: "
                f"{_format_registered(model_family)}")
        return preset
    candidates = [p for (fam, n, _v), p in _PRESET_REGISTRY.items()
                  if fam == model_family and n == name]
    if not candidates:
        raise UnknownPresetError(
            "pipeline.preset",
            f"No preset {name!r} for family {model_family!r}; registered: "
            f"{_format_registered(model_family)}")
    return max(candidates, key=lambda p: p.version)


def get_presets_for_family(model_family: str) -> list[InferencePreset]:
    return [p for (fam, _n, _v), p in _PRESET_REGISTRY.items()
            if fam == model_family]


def get_all_preset_names() -> list[str]:
    return sorted({p.name for p in _PRESET_REGISTRY.values()})


def validate_stage_overrides(preset: InferencePreset,
                             stage_overrides: dict[str, Any]) -> None:
    names = {s.name: s for s in preset.stage_schemas}
    for stage, overrides in stage_overrides.items():
        spec = names.get(stage)
        if spec is None:
            raise ConfigValidationError(
                f"request.stage_overrides.{stage}",
                f"Unknown stage; preset {preset.name!r} exposes "
                f"{sorted(names)}")
        if spec.allowed_overrides:
            bad = set(overrides) - set(spec.allowed_overrides)
            if bad:
                raise ConfigValidationError(
                    f"request.stage_overrides.{stage}",
                    f"Unsupported keys {sorted(bad)}; allowed: "
                    f"{sorted(spec.allowed_overrides)}")


def _format_registered(model_family: str) -> str:
    names = sorted({p.name for (fam, _n, _v), p in _PRESET_REGISTRY.items()
                    if fam == model_family})
    return ", ".join(names) if names else "(none)"


# -- built-in presets ---------------------------------------------------------

_DENOISE = PresetStageSpec(
    name="denoise", kind="denoising",
    allowed_overrides=frozenset({"num_inference_steps", "guidance_scale",
                                 "cfg_cache_interval", "VSA_sparsity"}))
_DECODE = PresetStageSpec(
    name="decode", kind="decoding",
    allowed_overrides=frozenset({"vae_tiling"}))

register_preset(InferencePreset(
    name="wan_t2v_1_3b_480p", version=1, model_family="wan",
    workload_type="t2v",
    description="Wan2.1 1.3B text-to-video at 480p",
    stage_schemas=(_DENOISE, _DECODE),
    defaults=dict(height=480, width=832, num_frames=81, fps=16,
                  num_inference_steps=50, guidance_scale=3.0)))

register_preset(InferencePreset(
    name="wan_t2v_14b_720p", version=1, model_family="wan",
    workload_type="t2v",
    description="Wan2.1 14B text-to-video at 720p",
    stage_schemas=(_DENOISE, _DECODE),
    defaults=dict(height=720, width=1280, num_frames=81, fps=16,
                  num_inference_steps=50, guidance_scale=5.0)))

register_preset(InferencePreset(
    name="wan_i2v_480p", version=1, model_family="wan",
    workload_type="i2v",
    description="Wan2.1 14B image-to-video at 480p",
    stage_schemas=(_DENOISE, _DECODE),
    defaults=dict(height=480, width=832, num_frames=81, fps=16,
                  num_inference_steps=40, guidance_scale=5.0)))

register_preset(InferencePreset(
    name="fastwan_t2v_3step", version=1, model_family="wan",
    workload_type="t2v",
    description="FastWan2.1 DMD 3-step distilled sampling",
    stage_schemas=(_DENOISE, _DECODE),
    defaults=dict(height=480, width=832, num_frames=81, fps=16,
                  num_inference_steps=3, guidance_scale=1.0,
                  dmd_denoising_steps=[1000, 757, 522])))

register_preset(InferencePreset(
    name="lucy_edit_dev", version=1, model_family="wan",
    workload_type="v2v",
    description="Lucy-Edit-Dev (Wan2.2 5B) instruction video editing",
    stage_schemas=(_DENOISE, _DECODE),
    defaults=dict(height=480, width=832, num_frames=81, fps=24,
                  num_inference_steps=50, guidance_scale=5.0,
                  negative_prompt="")))

register_preset(InferencePreset(
    name="wan_v2v_480p", version=1, model_family="wan",
    workload_type="v2v",
    description="Wan video-to-video control at 480p",
    stage_schemas=(_DENOISE, _DECODE),
    defaults=dict(height=480, width=832, num_frames=81, fps=16,
                  num_inference_steps=40, guidance_scale=5.0)))

register_preset(InferencePreset(
    name="lingbotworld_i2v", version=1, model_family="lingbotworld",
    workload_type="i2v",
    description="LingBot-World I2V with Plücker camera control",
    stage_schemas=(_DENOISE, _DECODE),
    defaults=dict(height=480, width=832, num_frames=81, fps=16,
                  num_inference_steps=70, guidance_scale=5.0)))

register_preset(InferencePreset(
    name="lingbotworld2_causal_fast_i2v", version=1,
    model_family="lingbotworld2", workload_type="i2v",
    description="LingBot-World 2 causal-fast streaming I2V (4-step "
    "distilled chunks)",
    stage_schemas=(_DENOISE, _DECODE),
    defaults=dict(height=480, width=832, num_frames=81, fps=16,
                  num_inference_steps=4, guidance_scale=1.0)))

register_preset(InferencePreset(
    name="hunyuan_720p", version=1, model_family="hunyuan",
    workload_type="t2v",
    description="HunyuanVideo 720p, embedded distilled guidance",
    stage_schemas=(_DENOISE, _DECODE),
    defaults=dict(height=720, width=1280, num_frames=125, fps=24,
                  num_inference_steps=50, guidance_scale=1.0)))

register_preset(InferencePreset(
    name="fasthunyuan_6step", version=1, model_family="hunyuan",
    workload_type="t2v",
    description="FastHunyuan distilled 6-step sampling (shift 17)",
    stage_schemas=(_DENOISE, _DECODE),
    defaults=dict(height=720, width=1280, num_frames=125, fps=24,
                  num_inference_steps=6, guidance_scale=1.0)))

_MINIMAX_DENOISE = PresetStageSpec(
    name="denoise", kind="denoising",
    description="Joint video/audio flow-matching denoising",
    allowed_overrides=frozenset({"num_inference_steps"}))

register_preset(InferencePreset(
    name="minimax_h3_t2va", version=1, model_family="minimax_h3",
    workload_type="t2v",
    description="MiniMax H3 text-to-video with synchronized stereo audio "
                "at 768p",
    stage_schemas=(_MINIMAX_DENOISE,),
    defaults=dict(fps=24, guidance_scale=1.0, negative_prompt="",
                  num_inference_steps=50, seed=0, height=768, width=1344,
                  num_frames=124)))

register_preset(InferencePreset(
    name="minimax_h3_fl2va", version=1, model_family="minimax_h3",
    workload_type="i2v",
    description="MiniMax H3 first/last-frame-to-video with synchronized "
                "stereo audio",
    stage_schemas=(_MINIMAX_DENOISE,),
    defaults=dict(fps=24, guidance_scale=1.0, negative_prompt="",
                  num_inference_steps=50, seed=0, height=768, width=1344,
                  num_frames=192)))
