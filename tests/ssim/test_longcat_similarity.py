"""SSIM E2E regression: longcat (reference analog:
fastvideo/tests/ssim/test_longcat_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
LONGCAT_MODEL_TO_PARAMS = {'longcat_t2v_480p': {'prompt': 'Waves rolling onto a black sand beach', 'height': 480, 'width': 832, 'num_frames': 45, 'num_inference_steps': 20, 'guidance_scale': 5.0, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(LONGCAT_MODEL_TO_PARAMS))
def test_longcat_similarity(case):
    run_ssim_case('LONGCAT', 'LongCat-Video-Diffusers', case,
                  LONGCAT_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
