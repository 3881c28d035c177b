"""Perf-threshold harness: config validation, run, threshold checks."""

import json

import pytest


def _valid_cfg(**over):
    cfg = {
        "id": "tiny-e2e",
        "generation": {"height": 32, "width": 32, "num_frames": 3,
                       "num_inference_steps": 1, "guidance_scale": 1.0,
                       "seed": 0},
        "runs": {"warmup": 0, "measure": 2},
        "thresholds": {"e2e_s": 100.0,
                       "stages": {"DenoisingStage": 100.0}},
    }
    cfg.update(over)
    return cfg


def test_config_validation():
    from fastvideo_tpu.eval.perf import validate_benchmark_config

    validate_benchmark_config(_valid_cfg())
    with pytest.raises(ValueError, match="missing required field"):
        validate_benchmark_config({"id": "x"})
    with pytest.raises(ValueError, match="runs.measure"):
        validate_benchmark_config(_valid_cfg(
            runs={"warmup": 0, "measure": 0}))
    with pytest.raises(ValueError, match="non-negative"):
        validate_benchmark_config(_valid_cfg(
            thresholds={"e2e_s": -1.0}))


def test_discovery_and_thresholds(tmp_path):
    from fastvideo_tpu.eval.perf import check_thresholds, discover_benchmarks

    (tmp_path / "a.json").write_text(json.dumps(_valid_cfg(id="a")))
    (tmp_path / "b.json").write_text(json.dumps(_valid_cfg(id="b")))
    cfgs = discover_benchmarks(str(tmp_path))
    assert [c["id"] for c in cfgs] == ["a", "b"]

    result = {"e2e_s": 2.0, "stages": {"DenoisingStage": 1.5}}
    ok = check_thresholds(result, _valid_cfg())
    assert ok == []
    bad = check_thresholds(result, _valid_cfg(
        thresholds={"e2e_s": 1.0, "stages": {"DenoisingStage": 1.0,
                                             "DecodingStage": 1.0}}))
    assert len(bad) == 3  # e2e over, stage over, stage missing


def test_check_thresholds_arm_overlay():
    """Per-arm nested thresholds (the int8 serving arm in
    benchmarks/fastwan_dmd_480p.json) overlay the defaults."""
    from fastvideo_tpu.eval.perf import check_thresholds

    cfg = _valid_cfg(thresholds={
        "e2e_s": 8.0, "stages": {"DenoisingStage": 4.0},
        "int8": {"e2e_s": 2.5, "stages": {"DenoisingStage": 1.0}},
    })
    result = {"e2e_s": 3.0, "stages": {"DenoisingStage": 1.5}}
    assert check_thresholds(result, cfg) == []  # within the default budget
    bad = check_thresholds(result, cfg, arm="int8")
    assert len(bad) == 2  # both tighter int8 budgets violated
    assert check_thresholds(result, cfg, arm="missing_arm") == []


class _FakeGenerator:
    def __init__(self, e2e=0.5):
        self.e2e = e2e
        self.calls = 0

    def generate_video(self, prompt, **kwargs):
        self.calls += 1
        return {"generation_time": self.e2e,
                "stage_times": {"DenoisingStage": self.e2e * 0.7,
                                "DecodingStage": self.e2e * 0.2}}


def test_run_benchmark_and_suite(tmp_path):
    from fastvideo_tpu.eval.perf import run_benchmark, run_suite

    gen = _FakeGenerator()
    cfg = _valid_cfg(runs={"warmup": 1, "measure": 3})
    result = run_benchmark(gen, cfg)
    assert gen.calls == 4
    assert result["e2e_s"] == pytest.approx(0.5)
    assert result["stages"]["DenoisingStage"] == pytest.approx(0.35)

    (tmp_path / "x.json").write_text(json.dumps(_valid_cfg(
        id="x", thresholds={"e2e_s": 0.1})))
    results = run_suite(lambda cfg: _FakeGenerator(0.5), str(tmp_path))
    assert len(results) == 1
    assert results[0]["violations"], "0.5s run must violate 0.1s budget"


class _FakeStreamingGenerator:
    """reset/step/finalize contract with a first-block compile penalty."""

    def __init__(self, block_s=0.001, frames=4):
        self.block_s = block_s
        self.frames = frames
        self.steps = 0

    def reset(self, prompt, output_path=None):
        self.steps = 0

    def step(self):
        import time

        import numpy as np

        time.sleep(self.block_s * (5 if self.steps == 0 else 1))
        self.steps += 1
        n = self.frames - 1 if self.steps == 1 else self.frames
        return np.zeros((n, 8, 8, 3), np.uint8)

    def finalize(self):
        return self.steps * self.frames - 1


def test_streaming_benchmark_mode():
    from fastvideo_tpu.eval.perf import (run_streaming_benchmark,
                                         validate_benchmark_config)

    cfg = {
        "id": "stream-x",
        "mode": "streaming",
        "stream": {"prompt": "p", "num_blocks": 4},
        "thresholds": {"steady_block_s": 10.0, "steady_fps": 0.1},
    }
    validate_benchmark_config(cfg)
    r = run_streaming_benchmark(_FakeStreamingGenerator(), cfg)
    assert r["violations"] == []
    assert len(r["block_latencies_s"]) == 4
    assert r["frames_per_block"] == [3, 4, 4, 4]
    assert r["first_block_s"] > r["steady_block_s"]
    # fps threshold is a floor: impossible fps must violate
    cfg_bad = {**cfg, "thresholds": {"steady_fps": 1e9}}
    r2 = run_streaming_benchmark(_FakeStreamingGenerator(), cfg_bad)
    assert r2["violations"]
    # validation rejects num_blocks < 2 and empty thresholds
    import pytest as _pytest
    with _pytest.raises(ValueError):
        validate_benchmark_config({**cfg, "stream": {"num_blocks": 1}})
    with _pytest.raises(ValueError):
        validate_benchmark_config({**cfg, "thresholds": {"e2e_s": 1.0}})
