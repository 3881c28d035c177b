"""SSIM E2E regression: fastwan_vsa (reference analog:
fastvideo/tests/ssim/test_fastwan_vsa_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
FASTWAN_VSA_MODEL_TO_PARAMS = {'fastwan_dmd3_vsa_480p': {'prompt': 'A curious raccoon peers through a vibrant field of yellow sunflowers', 'height': 480, 'width': 832, 'num_frames': 45, 'seed': 1024}}
GENERATOR_KWARGS = {'VSA_sparsity': 0.8}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(FASTWAN_VSA_MODEL_TO_PARAMS))
def test_fastwan_vsa_similarity(case):
    run_ssim_case('FASTWAN', 'FastWan2.1-T2V-1.3B-Diffusers', case,
                  FASTWAN_VSA_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
