"""SSIM E2E regression: flux_t2i (reference analog:
fastvideo/tests/ssim/test_flux_t2i_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
FLUX_T2I_MODEL_TO_PARAMS = {'flux_t2i_1024': {'prompt': 'A lighthouse on a cliff in a thunderstorm, oil painting', 'height': 1024, 'width': 1024, 'num_frames': 1, 'num_inference_steps': 20, 'guidance_scale': 3.5, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(FLUX_T2I_MODEL_TO_PARAMS))
def test_flux_t2i_similarity(case):
    run_ssim_case('FLUX', 'FLUX.1-dev-Diffusers', case,
                  FLUX_T2I_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
