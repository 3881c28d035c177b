"""SSIM E2E regression: matrixgame2 (reference analog:
fastvideo/tests/ssim/test_matrixgame2_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
MATRIXGAME2_MODEL_TO_PARAMS = {'matrixgame2_i2v_keyboard': {'prompt': 'first person walking forward', 'height': 352, 'width': 640, 'num_frames': 33, 'seed': 1024, 'image_path': 'tests/ssim/assets/matrixgame_input.png'}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(MATRIXGAME2_MODEL_TO_PARAMS))
def test_matrixgame2_similarity(case):
    run_ssim_case('MATRIXGAME2', 'Matrix-Game-2.0-Diffusers', case,
                  MATRIXGAME2_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
