"""SSIM E2E regression: turbodiffusion (reference analog:
fastvideo/tests/ssim/test_turbodiffusion_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
TURBODIFFUSION_MODEL_TO_PARAMS = {'turbodiffusion_int8_480p': {'prompt': 'A steam train crossing a stone viaduct', 'height': 480, 'width': 832, 'num_frames': 45, 'num_inference_steps': 4, 'guidance_scale': 1.0, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(TURBODIFFUSION_MODEL_TO_PARAMS))
def test_turbodiffusion_similarity(case):
    run_ssim_case('TURBODIFFUSION', 'TurboDiffusion-Wan2.1-T2V-1.3B', case,
                  TURBODIFFUSION_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
