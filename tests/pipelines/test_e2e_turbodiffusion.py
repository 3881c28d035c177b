"""End-to-end: tiny TurboDiffusion (Wan + rCM) checkpoint on CPU.

Exercises RCM 1-4 step SDE sampling over the Wan stack (reference
pipelines/basic/turbodiffusion/)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("turbo_tiny")
    path = make_tiny_wan_checkpoint(
        str(root / "TurboDiffusion-T2V-1.3B-tiny"))
    index = json.load(open(os.path.join(path, "model_index.json")))
    index["_class_name"] = "TurboDiffusionPipeline"
    json.dump(index, open(os.path.join(path, "model_index.json"), "w"))
    return path


def test_generate_video_turbodiffusion_e2e(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator
    from fastvideo_tpu.models.schedulers.scheduling_rcm import RCMScheduler

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    sched = gen.executor.pipeline.modules["scheduler"]
    assert isinstance(sched, RCMScheduler)
    assert sched.sigma_max == 80.0

    result = gen.generate_video(
        prompt="w1 w2",
        height=32,
        width=32,
        num_frames=5,
        num_inference_steps=2,  # rCM: 1-4 steps
        guidance_scale=1.0,
        seed=2,
        output_path=str(tmp_path),
        save_video=False,
    )
    frames = result["frames"][0]
    assert frames.shape == (5, 32, 32, 3)
    assert frames.dtype == np.uint8
    par.destroy_mesh()
