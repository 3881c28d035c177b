"""SSIM E2E regression: wan_t2v (reference analog:
fastvideo/tests/ssim/test_wan_t2v_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
WAN_T2V_MODEL_TO_PARAMS = {'wan_t2v_1_3b_480p': {'prompt': 'A curious raccoon peers through a vibrant field of yellow sunflowers', 'height': 480, 'width': 832, 'num_frames': 45, 'num_inference_steps': 20, 'guidance_scale': 6.0, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(WAN_T2V_MODEL_TO_PARAMS))
def test_wan_t2v_similarity(case):
    run_ssim_case('WAN_T2V', 'Wan2.1-T2V-1.3B-Diffusers', case,
                  WAN_T2V_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
