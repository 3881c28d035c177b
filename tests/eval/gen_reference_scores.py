"""Generate tests/eval/reference_scores.json by running the REFERENCE
implementations (/root/reference/fastvideo/eval) on fixed synthetic inputs.

Run once on a box that has the reference checkout; the committed JSON is
the fixture that test_reference_scores.py gates against. The reference
package's heavy __init__ chain (diffusers/torchvision/GPU deps) is
bypassed by installing minimal namespace stubs for the parent packages and
importing only the leaf metric modules, which depend on
torch/numpy/cv2 + fastvideo.eval.{base,registry,types} alone.

Usage: python tests/eval/gen_reference_scores.py [/root/reference]
"""

from __future__ import annotations

import importlib
import importlib.util
import json
import os
import sys
import types

import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "reference_scores.json")


def install_ref_packages() -> None:
    """Register fastvideo.* parent packages WITHOUT executing their
    __init__.py (which imports diffusers/torchvision...)."""
    for name, sub in [
        ("fastvideo", ""),
        ("fastvideo.eval", "eval"),
        ("fastvideo.eval.metrics", "eval/metrics"),
        ("fastvideo.eval.metrics.common", "eval/metrics/common"),
        ("fastvideo.eval.metrics.vbench", "eval/metrics/vbench"),
        ("fastvideo.eval.metrics.physics_iq", "eval/metrics/physics_iq"),
        ("fastvideo.eval.metrics.optical_flow",
         "eval/metrics/optical_flow"),
    ]:
        mod = types.ModuleType(name)
        mod.__path__ = [os.path.join(REF, "fastvideo", sub)]
        mod.__package__ = name
        sys.modules.setdefault(name, mod)
    # real leaf deps of the metric modules
    for name, rel in [
        ("fastvideo.eval.types", "eval/types.py"),
        ("fastvideo.eval.registry", "eval/registry.py"),
        ("fastvideo.eval.metrics.base", "eval/metrics/base.py"),
        ("fastvideo.eval.metrics.vbench._utils",
         "eval/metrics/vbench/_utils.py"),
        ("fastvideo.eval.metrics.physics_iq.utils",
         "eval/metrics/physics_iq/utils.py"),
        ("fastvideo.eval.metrics.optical_flow._shared",
         "eval/metrics/optical_flow/_shared.py"),
    ]:
        path = os.path.join(REF, "fastvideo", rel)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)


def moving_square_video(t=60, h=64, w=64, seed=0) -> np.ndarray:
    """[T, H, W, 3] float32 in [0,1]: textured background + moving square.
    Deterministic; enough motion for IoU/flow metrics to be non-trivial."""
    rng = np.random.default_rng(seed)
    bg = rng.uniform(0.2, 0.4, (h, w, 3)).astype(np.float32)
    frames = []
    for i in range(t):
        f = bg.copy()
        y = 8 + (i * 83 // max(t - 1, 1)) % (h - 24)
        x = 4 + (i * 57 // max(t - 1, 1)) % (w - 20)
        f[y:y + 16, x:x + 16] = [0.9, 0.1 + 0.01 * (i % 7), 0.2]
        frames.append(f)
    return np.stack(frames)


def main() -> None:
    install_ref_packages()
    import torch

    gen = moving_square_video(seed=0)
    ref = moving_square_video(seed=0)
    ref2 = moving_square_video(seed=1)  # different background texture
    gen_t = torch.from_numpy(gen).permute(0, 3, 1, 2)  # (T, C, H, W)
    ref_t = torch.from_numpy(ref).permute(0, 3, 1, 2)
    ref2_t = torch.from_numpy(ref2).permute(0, 3, 1, 2)

    scores: dict[str, float] = {}

    def run(metric, sample, key):
        metric.to(torch.device("cpu"))
        res = metric.compute(sample)
        scores[key] = float(res.score)
        print(f"{key}: {res.score:.6f}")

    from fastvideo.eval.metrics.common.psnr.metric import PSNRMetric
    from fastvideo.eval.metrics.common.ssim.metric import SSIMMetric

    run(PSNRMetric(), {"video": gen_t, "reference": ref2_t}, "common.psnr")
    run(SSIMMetric(), {"video": gen_t, "reference": ref2_t}, "common.ssim")

    from fastvideo.eval.metrics.vbench.temporal_flickering.metric import (
        TemporalFlickeringMetric)

    run(TemporalFlickeringMetric(), {"video": gen_t},
        "vbench.temporal_flickering")

    # model-backed vbench dims (AMT / RAFT): only runnable where their
    # vendored deps exist — skip cleanly elsewhere
    for modname, clsname, key in [
        ("fastvideo.eval.metrics.vbench.motion_smoothness.metric",
         "MotionSmoothnessMetric", "vbench.motion_smoothness"),
        ("fastvideo.eval.metrics.vbench.dynamic_degree.metric",
         "DynamicDegreeMetric", "vbench.dynamic_degree"),
        ("fastvideo.eval.metrics.vbench.subject_consistency.metric",
         "SubjectConsistencyMetric", "vbench.subject_consistency"),
    ]:
        try:
            mod = importlib.import_module(modname)
            run(getattr(mod, clsname)(), {"video": gen_t}, key)
        except Exception as exc:
            print(f"{key} skipped: {type(exc).__name__} {exc}")

    piq = importlib.import_module(
        "fastvideo.eval.metrics.physics_iq.utils")
    print("physics_iq utils:", [n for n in dir(piq)
                                if not n.startswith("_")])
    for modname, key in [
        ("fastvideo.eval.metrics.physics_iq.mse.metric",
         "physics_iq.mse"),
        ("fastvideo.eval.metrics.physics_iq.spatial_iou.metric",
         "physics_iq.spatial_iou"),
        ("fastvideo.eval.metrics.physics_iq.spatiotemporal_iou.metric",
         "physics_iq.spatiotemporal_iou"),
        ("fastvideo.eval.metrics.physics_iq.weighted_spatial_iou.metric",
         "physics_iq.weighted_spatial_iou"),
        ("fastvideo.eval.metrics.physics_iq.metric",
         "physics_iq.combined"),
    ]:
        try:
            mod = importlib.import_module(modname)
            cls = next(v for v in vars(mod).values()
                       if isinstance(v, type) and hasattr(v, "compute")
                       and v.__module__ == modname)
            sample = {"video": gen_t, "reference": ref2_t}
            if key == "physics_iq.combined":
                # combined normalizes against the variance between two
                # real takes (reference metric.py:79); use a spatially
                # shifted second take so the normalizer is non-degenerate
                sample["reference_take2"] = torch.from_numpy(
                    np.roll(ref2, shift=3, axis=2)).permute(0, 3, 1, 2)
            run(cls(), sample, key)
        except Exception as exc:
            print(f"{key} skipped: {type(exc).__name__} {exc}")

    # extra fixed-input cases exercising different regimes of the same
    # reference math (identical pair, shifted pair)
    gen_shift = torch.from_numpy(
        np.roll(gen, shift=2, axis=2)).permute(0, 3, 1, 2)
    run(PSNRMetric(), {"video": gen_t, "reference": gen_t},
        "common.psnr/identical")
    run(SSIMMetric(), {"video": gen_t, "reference": gen_shift},
        "common.ssim/shifted")
    flick_static = torch.from_numpy(
        np.repeat(gen[:1], 16, axis=0)).permute(0, 3, 1, 2)
    run(TemporalFlickeringMetric(), {"video": flick_static},
        "vbench.temporal_flickering/static")

    for modname, key in [
        ("fastvideo.eval.metrics.optical_flow.gt_optical_flow.metric",
         "optical_flow.gt_optical_flow"),
        ("fastvideo.eval.metrics.optical_flow.synthetic_optical_flow"
         ".metric", "optical_flow.synthetic_optical_flow"),
    ]:
        try:
            mod = importlib.import_module(modname)
            cls = next(v for v in vars(mod).values()
                       if isinstance(v, type) and hasattr(v, "compute")
                       and v.__module__ == modname)
            run(cls(), {"video": gen_t, "reference": ref2_t}, key)
        except Exception as exc:
            print(f"{key} skipped: {type(exc).__name__} {exc}")

    with open(OUT, "w") as fh:
        json.dump({
            "inputs": {
                "generator": "moving_square_video",
                "gen": {"t": 60, "h": 64, "w": 64, "seed": 0},
                "reference": {"t": 60, "h": 64, "w": 64, "seed": 1},
            },
            "scores": scores,
        }, fh, indent=1, sort_keys=True)
    print(f"wrote {OUT} with {len(scores)} scores")


if __name__ == "__main__":
    main()
