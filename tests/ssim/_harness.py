"""Shared SSIM-regression harness.

Reference analog: fastvideo/tests/ssim/inference_similarity_utils.py —
generate a full video through the PRODUCT path (VideoGenerator), compare
SSIM against the device-keyed stored reference, persist a *_ssim.json
artifact. Every case is env-gated and skips loudly, stating exactly what to
provide, so the whole suite arms itself the moment weights exist.

Checkpoint resolution order for a case with key ``KEY`` and model dir
``ModelDir``:
  1. $FASTVIDEO_REAL_CKPT_<KEY>               (explicit per-family path)
  2. $FASTVIDEO_CKPT_ROOT/<ModelDir>          (a local checkpoint farm)
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from fastvideo_tpu.eval.metrics import ssim as compute_ssim
from fastvideo_tpu.eval.reference_videos import (load_reference,
                                                 reference_dir,
                                                 write_ssim_results)

DEFAULT_SSIM_BAR = 0.90  # reference suite gates most models at 0.90+


def resolve_ckpt(key: str, model_dir: str) -> str:
    explicit = os.getenv(f"FASTVIDEO_REAL_CKPT_{key.upper()}")
    if explicit:
        if not os.path.exists(os.path.join(explicit, "model_index.json")):
            pytest.skip(
                f"FASTVIDEO_REAL_CKPT_{key.upper()}={explicit} is set but "
                "has no model_index.json — point it at a diffusers-format "
                "checkpoint directory")
        return explicit
    root = os.getenv("FASTVIDEO_CKPT_ROOT")
    if root:
        cand = os.path.join(root, model_dir)
        if os.path.exists(os.path.join(cand, "model_index.json")):
            return cand
    pytest.skip(
        f"no weights for {model_dir}: set FASTVIDEO_REAL_CKPT_{key.upper()} "
        f"to a diffusers checkpoint dir, or FASTVIDEO_CKPT_ROOT to a farm "
        f"containing {model_dir}/ (this box has zero egress; the harness "
        f"is ready)")


def run_ssim_case(key: str, model_dir: str, case_name: str,
                  gen_kwargs: dict, *, ssim_bar: float = DEFAULT_SSIM_BAR,
                  generator_kwargs: dict | None = None,
                  tier: str = "fast") -> float:
    ckpt = resolve_ckpt(key, model_dir)
    ref = load_reference(case_name, tier=tier)
    if ref is None:
        pytest.skip(
            f"no reference frames for {case_name} under "
            f"{reference_dir(tier)} — run `fastvideo eval refs fetch` "
            f"(or generate on a trusted build and `fastvideo eval refs "
            f"copy-local --case {case_name} --src frames.npy`)")

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1,
                                         **(generator_kwargs or {}))
    frames_list = gen.generate_video(save_video=False, return_frames=True,
                                     **gen_kwargs)
    frames = np.asarray(frames_list[0])
    par.destroy_mesh()
    assert frames.shape == ref.shape, (frames.shape, ref.shape)
    score = float(
        compute_ssim(frames.astype(np.float32) / 255.0,
                     ref.astype(np.float32) / 255.0))
    out_dir = os.path.join("outputs", "ssim", tier)
    write_ssim_results(out_dir, case_name, {
        "case": case_name,
        "model": model_dir,
        "ssim": score,
        "bar": ssim_bar,
        "gen_kwargs": {k: v for k, v in gen_kwargs.items()
                       if isinstance(v, (int, float, str, bool))},
    })
    assert score >= ssim_bar, (
        f"{case_name}: SSIM {score:.4f} < bar {ssim_bar} vs stored "
        f"reference ({reference_dir(tier)})")
    return score
