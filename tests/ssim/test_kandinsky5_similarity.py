"""SSIM E2E regression: kandinsky5 (reference analog:
fastvideo/tests/ssim/test_kandinsky5_similarity.py). Env-gated on real weights +
stored reference frames; skips loudly otherwise."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from _harness import run_ssim_case  # noqa: E402

REQUIRED_CHIPS = 1
KANDINSKY5_MODEL_TO_PARAMS = {'kandinsky5_t2v_512': {'prompt': 'A red fox trotting through fresh snow at dawn', 'height': 512, 'width': 768, 'num_frames': 25, 'num_inference_steps': 20, 'guidance_scale': 5.0, 'seed': 1024}}
GENERATOR_KWARGS = {}


@pytest.mark.real_ckpt
@pytest.mark.parametrize("case", sorted(KANDINSKY5_MODEL_TO_PARAMS))
def test_kandinsky5_similarity(case):
    run_ssim_case('KANDINSKY5', 'Kandinsky-5.0-T2V-Lite-Diffusers', case,
                  KANDINSKY5_MODEL_TO_PARAMS[case],
                  generator_kwargs=GENERATOR_KWARGS)
