"""SSIM E2E regression: wan_i2v (reference analog:
fastvideo/tests/ssim/test_wan_i2v_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
WAN_I2V_MODEL_TO_PARAMS = {'wan_i2v_480p': {'prompt': 'The creature looks around slowly', 'height': 480, 'width': 832, 'num_frames': 45, 'num_inference_steps': 20, 'guidance_scale': 5.0, 'seed': 1024, 'image_path': 'tests/ssim/assets/i2v_input.png'}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(WAN_I2V_MODEL_TO_PARAMS))
def test_wan_i2v_similarity(case):
    run_ssim_case('WAN_I2V', 'Wan2.1-I2V-14B-480P-Diffusers', case,
                  WAN_I2V_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
