"""SSIM E2E regression: causal_selfforcing (reference analog:
fastvideo/tests/ssim/test_causal_selfforcing_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
CAUSAL_SELFFORCING_MODEL_TO_PARAMS = {'causal_dmd_streaming_480p': {'prompt': 'A paper boat floating down a rain gutter', 'height': 480, 'width': 832, 'num_frames': 45, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(CAUSAL_SELFFORCING_MODEL_TO_PARAMS))
def test_causal_selfforcing_similarity(case):
    run_ssim_case('CAUSAL', 'FastWan2.1-T2V-1.3B-Causal-Diffusers', case,
                  CAUSAL_SELFFORCING_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
