"""SSIM E2E regression: ltx2 (reference analog:
fastvideo/tests/ssim/test_ltx2_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
LTX2_MODEL_TO_PARAMS = {'ltx2_t2v_512': {'prompt': 'A hot air balloon drifting over patchwork fields', 'height': 512, 'width': 768, 'num_frames': 49, 'num_inference_steps': 20, 'guidance_scale': 4.0, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(LTX2_MODEL_TO_PARAMS))
def test_ltx2_similarity(case):
    run_ssim_case('LTX2', 'LTX-2-Diffusers', case,
                  LTX2_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
