"""GeneratorConfig/GenerationRequest end-to-end on a tiny checkpoint."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("wan_tiny_api")
    return make_tiny_wan_checkpoint(str(root / "Wan2.1-T2V-tiny-Diffusers"))


def test_generate_from_typed_request(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.api.parser import parse_dataclass
    from fastvideo_tpu.api.schema import GenerationRequest, GeneratorConfig
    from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

    par.destroy_mesh()
    cfg = parse_dataclass(GeneratorConfig, {
        "model_path": ckpt,
        "engine": {"num_gpus": 1},
        "pipeline": {"preset": "wan_t2v_1_3b_480p"},
    })
    gen = VideoGenerator.from_generator_config(cfg)
    req = parse_dataclass(GenerationRequest, {
        "prompt": "w1 w2",
        # explicit sampling fields override preset defaults
        "sampling": {"height": 32, "width": 32, "num_frames": 3,
                     "num_inference_steps": 2, "guidance_scale": 1.0,
                     "seed": 5},
        "output": {"save_video": False, "return_frames": True},
    })
    # return_frames=True (the schema default) returns the frames directly
    frames_list = gen.generate(req)
    assert isinstance(frames_list, list)
    frames = frames_list[0]
    assert frames.shape == (3, 32, 32, 3)
    assert frames.dtype == np.uint8
    par.destroy_mesh()


def test_from_config_mapping_and_from_file(ckpt, tmp_path):
    """Drop-in constructors (reference video_generator.py:240,255):
    from_config accepts a plain mapping; from_file reads JSON/YAML with
    dotted-key overrides."""
    import json

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_config({
        "model_path": ckpt,
        "engine": {"num_gpus": 1},
    })
    frames = gen.generate_video(prompt="w1 w2", height=32, width=32,
                                num_frames=3, num_inference_steps=2,
                                guidance_scale=1.0, seed=5,
                                save_video=False, return_frames=True)
    assert frames[0].shape == (3, 32, 32, 3)
    par.destroy_mesh()

    cfg_path = tmp_path / "generator.json"
    cfg_path.write_text(json.dumps({
        "model_path": ckpt,
        "engine": {"num_gpus": 2},
    }))
    gen2 = VideoGenerator.from_file(str(cfg_path),
                                    overrides=["engine.num_gpus=1"])
    assert gen2.fastvideo_args.num_gpus == 1
    par.destroy_mesh()


def test_device_rng_latents(ckpt, monkeypatch):
    """FASTVIDEO_DEVICE_RNG=1 draws initial noise on-device; generation
    still completes and is seed-deterministic."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

    monkeypatch.setenv("FASTVIDEO_DEVICE_RNG", "1")
    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    kw = dict(prompt="w1 w2", height=32, width=32, num_frames=3,
              num_inference_steps=2, guidance_scale=1.0, seed=7,
              save_video=False, return_frames=True)
    a = gen.generate_video(**kw)[0]
    b = gen.generate_video(**kw)[0]
    np.testing.assert_array_equal(a, b)
    par.destroy_mesh()
