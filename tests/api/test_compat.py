"""Legacy kwargs <-> typed config compat layer + image processor."""

import numpy as np


def test_legacy_from_pretrained_to_config():
    from fastvideo_tpu.api.compat import legacy_from_pretrained_to_config

    cfg = legacy_from_pretrained_to_config("/m/wan", num_gpus=8, sp_size=4,
                                           lora_path="/lora")
    assert cfg.model_path == "/m/wan"
    assert cfg.engine.num_gpus == 8
    assert cfg.engine.parallelism.sp_size == 4
    assert cfg.pipeline.components.lora_path == "/lora"


def test_legacy_generate_call_to_request_roundtrip():
    from fastvideo_tpu.api.compat import (legacy_generate_call_to_request,
                                          request_to_sampling_param)

    req = legacy_generate_call_to_request(
        "a cat", height=320, width=576, num_frames=33, seed=7,
        guidance_scale=2.5, save_video=False, cfg_cache_interval=2,
        image_path="/img.png", custom_knob=123)
    assert req.sampling.height == 320
    assert req.runtime.cfg_cache_interval == 2
    assert req.inputs.image_path == "/img.png"
    assert req.extensions["custom_knob"] == 123

    param = request_to_sampling_param(req)
    assert param.prompt == "a cat"
    assert param.height == 320 and param.seed == 7
    assert param.save_video is False
    assert param.image_path == "/img.png"
    assert param.extra["custom_knob"] == 123


def test_image_processor():
    from fastvideo_tpu.image_processor import ImageProcessor

    proc = ImageProcessor(vae_scale_factor=8)
    img = np.random.default_rng(0).integers(0, 255, (37, 61, 3),
                                            dtype=np.uint8)
    out = proc.preprocess(img)
    assert out.shape == (1, 3, 32, 56)  # floored to /8
    assert out.min() >= -1.0 and out.max() <= 1.0
    vid = proc.preprocess_video_frame(img, height=16, width=24)
    assert vid.shape == (1, 3, 1, 16, 24)
