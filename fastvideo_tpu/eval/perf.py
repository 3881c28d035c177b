"""Performance-threshold harness.

Analog of /root/reference/fastvideo/tests/performance/
test_inference_performance.py (:75-260): JSON benchmark configs are
discovered from a directory, validated, executed N times through a
VideoGenerator, and the averaged end-to-end / per-stage times are
compared against per-benchmark thresholds.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
from typing import Any

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

REQUIRED_FIELDS = ("id", "generation", "runs", "thresholds")


STREAMING_REQUIRED_FIELDS = ("id", "stream", "thresholds")


def validate_benchmark_config(cfg: dict[str, Any],
                              path: str = "<memory>") -> None:
    if cfg.get("mode") == "streaming":
        _validate_streaming_config(cfg, path)
        return
    if cfg.get("mode") == "training":
        for field in ("id", "train", "thresholds"):
            if field not in cfg:
                raise ValueError(f"{path}: missing required field {field!r}")
        if not isinstance(cfg["thresholds"].get("step_s"), (int, float)):
            raise ValueError(f"{path}: training thresholds need step_s")
        return
    for field in REQUIRED_FIELDS:
        if field not in cfg:
            raise ValueError(f"{path}: missing required field {field!r}")
    if not isinstance(cfg["id"], str) or not cfg["id"]:
        raise ValueError(f"{path}: 'id' must be a non-empty string")
    runs = cfg["runs"]
    for k in ("warmup", "measure"):
        if not isinstance(runs.get(k), int) or runs[k] < (0 if k == "warmup"
                                                          else 1):
            raise ValueError(f"{path}: runs.{k} must be an int "
                             f"({'>=0' if k == 'warmup' else '>=1'})")
    th = cfg["thresholds"]
    if "e2e_s" not in th and not th.get("stages"):
        raise ValueError(f"{path}: thresholds need 'e2e_s' and/or 'stages'")
    for key, val in {**{"e2e_s": th.get("e2e_s", 0.0)},
                     **th.get("stages", {})}.items():
        if not isinstance(val, (int, float)) or val < 0:
            raise ValueError(f"{path}: threshold {key!r} must be a "
                             "non-negative number")


def _validate_streaming_config(cfg: dict[str, Any], path: str) -> None:
    for field in STREAMING_REQUIRED_FIELDS:
        if field not in cfg:
            raise ValueError(f"{path}: missing required field {field!r}")
    st = cfg["stream"]
    if not isinstance(st.get("num_blocks"), int) or st["num_blocks"] < 2:
        raise ValueError(f"{path}: stream.num_blocks must be an int >= 2 "
                         "(block 0 is the cold block; steady state needs "
                         "at least one more)")
    th = cfg["thresholds"]
    known = {"first_block_s", "steady_block_s", "steady_fps"}
    if not (known & set(th)):
        raise ValueError(f"{path}: thresholds need one of {sorted(known)}")
    for key, val in th.items():
        if not isinstance(val, (int, float)) or val < 0:
            raise ValueError(f"{path}: threshold {key!r} must be a "
                             "non-negative number")


def run_streaming_benchmark(gen, cfg: dict[str, Any]) -> dict[str, Any]:
    """Per-block latency + steady-state FPS through a streaming generator.

    ``gen`` follows the StreamingVideoGenerator reset/step/finalize
    contract (the reference's realtime causal serving loop). Block 0 pays
    compile + cache warmup; steady state is blocks 1..N-1.
    """
    import time

    st = cfg["stream"]
    gen.reset(st.get("prompt", "benchmark prompt"))
    latencies: list[float] = []
    frames_per_block: list[int] = []
    for _ in range(st["num_blocks"]):
        t0 = time.perf_counter()
        frames = gen.step()
        latencies.append(time.perf_counter() - t0)
        frames_per_block.append(int(frames.shape[0]))
    gen.finalize()
    steady_lat = latencies[1:]
    steady_frames = frames_per_block[1:]
    steady_block_s = statistics.mean(steady_lat)
    steady_fps = sum(steady_frames) / sum(steady_lat)
    result = {
        "id": cfg["id"],
        "first_block_s": latencies[0],
        "steady_block_s": steady_block_s,
        "steady_block_min_s": min(steady_lat),
        "steady_fps": steady_fps,
        "best_fps": max(
            f / t for f, t in zip(steady_frames, steady_lat, strict=True)),
        "block_latencies_s": [round(t, 4) for t in latencies],
        "frames_per_block": frames_per_block,
    }
    th = cfg["thresholds"]
    violations = []
    for key in ("first_block_s", "steady_block_s"):
        if key in th and result[key] > th[key]:
            violations.append(
                f"{key} {result[key]:.3f}s > threshold {th[key]:.3f}s")
    if "steady_fps" in th and result["steady_fps"] < th["steady_fps"]:
        violations.append(f"steady_fps {result['steady_fps']:.2f} < "
                          f"threshold {th['steady_fps']:.2f}")
    result["violations"] = violations
    return result


def discover_benchmarks(config_dir: str) -> list[dict[str, Any]]:
    configs = []
    for path in sorted(glob.glob(os.path.join(config_dir, "*.json"))):
        with open(path) as fh:
            cfg = json.load(fh)
        validate_benchmark_config(cfg, path)
        cfg["_path"] = path
        configs.append(cfg)
    return configs


def run_benchmark(generator, cfg: dict[str, Any]) -> dict[str, Any]:
    """Execute one benchmark config; returns averaged timings."""
    gen_kwargs = dict(cfg["generation"])
    prompt = gen_kwargs.pop("prompt", "benchmark prompt")
    gen_kwargs.setdefault("save_video", False)
    runs = cfg["runs"]
    for _ in range(runs["warmup"]):
        generator.generate_video(prompt, **gen_kwargs)
    e2e_times: list[float] = []
    stage_times: dict[str, list[float]] = {}
    for _ in range(runs["measure"]):
        result = generator.generate_video(prompt, **gen_kwargs)
        e2e_times.append(result["generation_time"])
        for stage, t in result["stage_times"].items():
            stage_times.setdefault(stage, []).append(t)
    return {
        "id": cfg["id"],
        "e2e_s": statistics.mean(e2e_times),
        "e2e_min_s": min(e2e_times),
        "stages": {k: statistics.mean(v) for k, v in stage_times.items()},
        "runs": runs["measure"],
    }


def check_thresholds(result: dict[str, Any], cfg: dict[str, Any],
                     arm: str | None = None) -> list[str]:
    """Returns human-readable violations (empty = within budget).

    ``arm`` selects a nested per-arm threshold override (e.g. the
    "int8" serving arm in benchmarks/fastwan_dmd_480p.json): the arm's
    e2e_s/stages budgets replace the defaults where present.
    """
    violations = []
    th = cfg["thresholds"]
    if arm is not None and isinstance(th.get(arm), dict):
        over = th[arm]
        th = {**th, **{k: v for k, v in over.items() if k != "stages"},
              "stages": {**th.get("stages", {}), **over.get("stages", {})}}
    if "e2e_s" in th and result["e2e_s"] > th["e2e_s"]:
        violations.append(
            f"e2e {result['e2e_s']:.3f}s > threshold {th['e2e_s']:.3f}s")
    for stage, limit in th.get("stages", {}).items():
        measured = result["stages"].get(stage)
        if measured is None:
            violations.append(f"stage {stage!r} missing from result")
        elif measured > limit:
            violations.append(
                f"stage {stage} {measured:.3f}s > threshold {limit:.3f}s")
    return violations


def run_suite(generator_factory, config_dir: str) -> list[dict[str, Any]]:
    """Run every benchmark in a directory; attach violations per result."""
    results = []
    for cfg in discover_benchmarks(config_dir):
        if cfg.get("mode") in ("streaming", "training"):
            # streaming specs need a reset/step/finalize generator
            # (run_streaming_benchmark, see bench.py); training specs are
            # driven by scripts/bench_train_step.py
            logger.info("perf %s: skipped (%s mode)", cfg["id"],
                        cfg["mode"])
            continue
        generator = generator_factory(cfg)
        result = run_benchmark(generator, cfg)
        result["violations"] = check_thresholds(result, cfg)
        logger.info("perf %s: e2e %.3fs, violations: %s", cfg["id"],
                    result["e2e_s"], result["violations"] or "none")
        results.append(result)
    return results
