"""Typed API layer: parser, presets, request flattening."""

import pytest


def test_parse_run_config_nested():
    from fastvideo_tpu.api.parser import explicit_paths, parse_dataclass
    from fastvideo_tpu.api.schema import RunConfig

    cfg = parse_dataclass(RunConfig, {
        "generator": {
            "model_path": "/m/FastWan2.1-T2V-1.3B",
            "engine": {"num_gpus": 8,
                       "parallelism": {"sp_size": 4}},
        },
        "request": {
            "prompt": "a cat",
            "sampling": {"height": 480, "num_inference_steps": 3},
        },
    })
    assert cfg.generator.engine.num_gpus == 8
    assert cfg.generator.engine.parallelism.sp_size == 4
    assert cfg.request.sampling.height == 480
    # defaults untouched
    assert cfg.generator.engine.parallelism.tp_size == -1
    paths = explicit_paths(cfg)
    assert "request.sampling.height" in paths
    assert "request.sampling.width" not in paths


def test_parse_unknown_field_path():
    from fastvideo_tpu.api.errors import UnknownFieldError
    from fastvideo_tpu.api.parser import parse_dataclass
    from fastvideo_tpu.api.schema import RunConfig

    with pytest.raises(UnknownFieldError) as ei:
        parse_dataclass(RunConfig, {
            "generator": {"engine": {"num_cpus": 4}}})
    assert "generator.engine.num_cpus" in str(ei.value)


def test_yaml_config_file(tmp_path):
    from fastvideo_tpu.api.parser import load_config_file
    from fastvideo_tpu.api.schema import ServeConfig

    p = tmp_path / "serve.yaml"
    p.write_text("""
generator:
  model_path: /models/wan
  engine:
    num_gpus: 4
server:
  port: 9000
default_request:
  sampling:
    num_inference_steps: 3
    fps: 16
""")
    cfg = load_config_file(ServeConfig, str(p))
    assert cfg.generator.model_path == "/models/wan"
    assert cfg.server.port == 9000
    assert cfg.default_request.sampling.num_inference_steps == 3


def test_presets_lookup_and_validation():
    from fastvideo_tpu.api.errors import (ConfigValidationError,
                                          UnknownPresetError)
    from fastvideo_tpu.api.presets import (get_all_preset_names, get_preset,
                                           validate_stage_overrides)

    preset = get_preset("wan", "fastwan_t2v_3step")
    assert preset.defaults["num_inference_steps"] == 3
    assert "hunyuan_720p" in get_all_preset_names()

    with pytest.raises(UnknownPresetError):
        get_preset("wan", "nope")

    validate_stage_overrides(preset, {"denoise": {"guidance_scale": 2.0}})
    with pytest.raises(ConfigValidationError):
        validate_stage_overrides(preset, {"upscale": {}})
    with pytest.raises(ConfigValidationError):
        validate_stage_overrides(preset, {"denoise": {"bogus": 1}})


def test_generation_kwargs_flatten():
    from fastvideo_tpu.api.parser import parse_dataclass
    from fastvideo_tpu.api.schema import GenerationRequest, generation_kwargs

    req = parse_dataclass(GenerationRequest, {
        "prompt": "a dog",
        "sampling": {"height": 320, "width": 576, "seed": 7},
        "runtime": {"cfg_cache_interval": 2, "VSA_sparsity": 0.9},
        "output": {"save_video": False},
    })
    kwargs = generation_kwargs(req)
    assert kwargs["height"] == 320 and kwargs["seed"] == 7
    assert kwargs["cfg_cache_interval"] == 2
    assert kwargs["VSA_sparsity"] == 0.9
    assert kwargs["save_video"] is False
    assert "prompt" not in kwargs  # passed separately
