"""SSIM E2E regression: hunyuan (reference analog:
fastvideo/tests/ssim/test_hunyuan_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
HUNYUAN_MODEL_TO_PARAMS = {'hunyuan_t2v_720p': {'prompt': 'A cat walks on the grass, realistic style', 'height': 720, 'width': 1280, 'num_frames': 45, 'num_inference_steps': 6, 'guidance_scale': 1.0, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(HUNYUAN_MODEL_TO_PARAMS))
def test_hunyuan_similarity(case):
    run_ssim_case('HUNYUAN', 'FastHunyuan-diffusers', case,
                  HUNYUAN_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
