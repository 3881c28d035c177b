"""SSIM E2E regression: sd35 (reference analog:
fastvideo/tests/ssim/test_sd35_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
SD35_MODEL_TO_PARAMS = {'sd35_t2i_1024': {'prompt': 'A glass terrarium with tiny glowing mushrooms', 'height': 1024, 'width': 1024, 'num_frames': 1, 'num_inference_steps': 20, 'guidance_scale': 4.5, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(SD35_MODEL_TO_PARAMS))
def test_sd35_similarity(case):
    run_ssim_case('SD35', 'stable-diffusion-3.5-medium-Diffusers', case,
                  SD35_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
