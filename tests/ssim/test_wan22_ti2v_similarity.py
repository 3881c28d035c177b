"""SSIM E2E regression: wan22_ti2v (reference analog:
fastvideo/tests/ssim/test_wan22_ti2v_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
WAN22_TI2V_MODEL_TO_PARAMS = {'wan22_ti2v_720p': {'prompt': 'A sailboat gliding across a calm bay at sunset', 'height': 704, 'width': 1280, 'num_frames': 49, 'num_inference_steps': 20, 'guidance_scale': 5.0, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(WAN22_TI2V_MODEL_TO_PARAMS))
def test_wan22_ti2v_similarity(case):
    run_ssim_case('WAN22_TI2V', 'Wan2.2-TI2V-5B-Diffusers', case,
                  WAN22_TI2V_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
