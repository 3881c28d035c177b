"""SSIM E2E regression: stable_audio (reference analog:
fastvideo/tests/ssim/test_stable_audio_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
STABLE_AUDIO_MODEL_TO_PARAMS = {'stable_audio_47s': {'prompt': 'Gentle rain on a tin roof with distant thunder', 'num_frames': 1, 'height': 64, 'width': 64, 'num_inference_steps': 50, 'guidance_scale': 7.0, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(STABLE_AUDIO_MODEL_TO_PARAMS))
def test_stable_audio_similarity(case):
    run_ssim_case('STABLE_AUDIO', 'stable-audio-open-1.0', case,
                  STABLE_AUDIO_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
