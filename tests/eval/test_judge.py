"""Pairwise VLM-judge metric with an injected local judge
(reference eval/metrics/judge/third_person_separation/)."""

import numpy as np
import pytest


def _metric(judge, k=3, cache_dir=None, monkeypatch=None):
    from fastvideo_tpu.eval.suite.judge import ThirdPersonSeparationMetric

    if cache_dir is not None and monkeypatch is not None:
        monkeypatch.setenv("FASTVIDEO_EVAL_CACHE", str(cache_dir))
    return ThirdPersonSeparationMetric(k=k, judge=judge)


def test_registered_and_gated():
    from fastvideo_tpu.eval.registry import (list_metric_classes,
                                             missing_dependencies)

    assert "judge.third_person_separation" in list_metric_classes()
    # default (no injected judge) gates on google.genai
    missing = missing_dependencies("judge.third_person_separation")
    assert missing == [] or "google.genai" in missing


def test_win_rate_and_counterbalancing(tmp_path, monkeypatch):
    calls = []

    def always_first(image, v1, v2, action):
        calls.append((v1, v2))
        return "video_1"

    m = _metric(always_first, k=3, cache_dir=tmp_path,
                monkeypatch=monkeypatch)
    m.reset()
    # "video_1 always wins" + counterbalanced order => mixed verdicts
    for i in range(4):
        m.accumulate({"video_path": f"/c/{i}.mp4",
                      "reference_path": f"/b/{i}.mp4",
                      "text_prompt": "walk forward", "action": "W"})
    res = m.finalize()
    assert len(calls) == 12  # 4 pairs x k=3
    # order alternates within each pair's k trials (seeded by the pair):
    # with k=3 every pair gets 2:1 or 1:2 -> all verdicts decided
    assert res.details["n"] == 4
    assert res.details["wins"] + res.details["losses"] == 4
    assert res.details["per_action"]["W"]["n"] == 4
    assert res.score == res.details["wins"] / 4


def test_cache_reuse(tmp_path, monkeypatch):
    count = {"n": 0}

    def judge(image, v1, v2, action):
        count["n"] += 1
        return "tie"

    m = _metric(judge, k=2, cache_dir=tmp_path, monkeypatch=monkeypatch)
    m.reset()
    sample = {"video_path": "/c/a.mp4", "reference_path": "/b/a.mp4",
              "text_prompt": "jump"}
    m.accumulate(sample)
    assert count["n"] == 2
    # same pair again: served from the disk cache
    m2 = _metric(judge, k=2, cache_dir=tmp_path, monkeypatch=monkeypatch)
    m2.reset()
    m2.accumulate(sample)
    assert count["n"] == 2
    res = m2.finalize()
    assert res.details["ties"] == 1 and res.score is None

    # larger k invalidates the cached verdict (k not in key, but gated)
    m3 = _metric(judge, k=4, cache_dir=tmp_path, monkeypatch=monkeypatch)
    m3.reset()
    m3.accumulate(sample)
    assert count["n"] == 6


def test_merge_and_skip(tmp_path, monkeypatch):
    def judge(image, v1, v2, action):
        return "video_2"

    a = _metric(judge, k=1, cache_dir=tmp_path, monkeypatch=monkeypatch)
    b = _metric(judge, k=1, cache_dir=tmp_path, monkeypatch=monkeypatch)
    a.reset(), b.reset()
    a.accumulate({"video_path": "/c/1.mp4", "reference_path": "/b/1.mp4"})
    b.accumulate({"video_path": "/c/2.mp4", "reference_path": "/b/2.mp4"})
    b.accumulate({"video": np.zeros((2, 4, 4, 3))})  # no paths -> ignored
    a.merge_from(b)
    assert a.finalize().details["n"] == 2

    empty = _metric(judge, cache_dir=tmp_path, monkeypatch=monkeypatch)
    empty.reset()
    assert empty.finalize().score is None
