"""Performance dashboard: store, metric policies, regression summary,
trends, HTTP backend (reference fastvideo/performance_dashboard/)."""

import json
import urllib.request

import numpy as np
import pytest


def _record(e2e, *, ts, source="local", success=True, sha="abc",
            model="FastWan2.1-T2V-1.3B", decode=None, overrides=None):
    rec = {"model_id": model, "gpu_type": "tpu-1chip",
           "workload_id": "t2v-5s-480p", "timestamp": ts,
           "commit_sha": sha, "run_source": source, "success": success,
           "e2e_s": e2e}
    if decode is not None:
        rec["vae_decode_time_s"] = decode
    if overrides is not None:
        rec["regression_thresholds"] = overrides
    return rec


def _seed_store(root, values, **kw):
    from fastvideo_tpu.performance.store import append_record

    for i, v in enumerate(values):
        append_record(_record(v, ts=f"2026-08-{10 + i:02d}T00:00:00+00:00",
                              sha=f"c{i}", **kw), str(root))


def test_store_roundtrip_and_windowing(tmp_path):
    from fastvideo_tpu.performance.store import append_record, load_records

    p = append_record(_record(9.0, ts="2026-08-10T00:00:00+00:00"),
                      str(tmp_path))
    assert p.endswith(".json")
    append_record(_record(8.5, ts="2026-08-11T00:00:00+00:00",
                          success=False), str(tmp_path))
    recs = load_records(str(tmp_path))
    assert len(recs) == 2
    assert len(load_records(str(tmp_path), successful_only=True)) == 1
    # ancient record excluded by the day window
    append_record(_record(7.0, ts="2020-01-01T00:00:00+00:00"),
                  str(tmp_path))
    assert len(load_records(str(tmp_path), days=3650)) == 3
    assert len(load_records(str(tmp_path), days=400)) == 2


def test_regression_delta_directions():
    from fastvideo_tpu.performance.metric_policy import (
        DEFAULT_METRIC_POLICIES, regression_delta, resolve_metric_policies)

    by_key = {p.key: p for p in DEFAULT_METRIC_POLICIES}
    lat = by_key["e2e_s"]  # lower is better, 8% / 0.3s floors
    assert regression_delta(lat, 10.0, 9.0).regressed  # +11%, +1.0s
    assert not regression_delta(lat, 9.2, 9.0).regressed  # +2% < 8%
    assert not regression_delta(lat, 0.5, 0.3).regressed  # abs floor
    thr = by_key["steps_per_s"]  # higher is better
    assert regression_delta(thr, 0.5, 1.0).regressed
    assert not regression_delta(thr, 1.1, 1.0).regressed

    # per-record overrides + gating
    pols = resolve_metric_policies({"e2e_s": {"threshold_percent": 0.5,
                                              "gated": False}})
    e2e = next(p for p in pols if p.key == "e2e_s")
    assert e2e.threshold_percent == 0.5 and not e2e.gated
    d = regression_delta(e2e, 20.0, 9.0)
    assert d.threshold_exceeded and not d.regressed  # ungated


def test_summary_rolling_median_and_pr_exclusion(tmp_path):
    from fastvideo_tpu.performance.dashboard import build_latest_summary
    from fastvideo_tpu.performance.store import append_record, load_records

    _seed_store(tmp_path, [9.0, 9.1, 8.9, 9.0, 9.05])
    # a PR run spikes but must NOT move the baseline
    append_record(_record(15.0, ts="2026-08-16T00:00:00+00:00",
                          source="pr", sha="pr1"), str(tmp_path))
    # latest local run regresses vs the median(9.0ish)
    append_record(_record(12.0, ts="2026-08-17T00:00:00+00:00", sha="new"),
                  str(tmp_path))
    rows = build_latest_summary(load_records(str(tmp_path)))
    assert len(rows) == 1
    row = rows[0]
    m = row["metrics"]["e2e_s"]
    assert m["baseline"] == pytest.approx(9.0, abs=0.1)
    assert m["regressed"]
    assert "e2e_s" in row["failing_metrics"]
    assert row["computed_regression_status"] == "fail"

    # filtering the summary to PR runs compares the PR against the same
    # local baseline
    pr_rows = build_latest_summary(load_records(str(tmp_path)),
                                   run_source="pr")
    assert pr_rows[0]["metrics"]["e2e_s"]["current"] == 15.0
    assert pr_rows[0]["metrics"]["e2e_s"]["baseline"] == pytest.approx(
        9.0, abs=0.1)


def test_trends_and_cohorts(tmp_path):
    from fastvideo_tpu.performance.dashboard import build_trends
    from fastvideo_tpu.performance.store import load_records

    _seed_store(tmp_path, [9.0, 8.0])
    _seed_store(tmp_path, [3.0], model="LTX-2")
    groups = build_trends(load_records(str(tmp_path)))
    assert len(groups) == 2
    wan = next(g for g in groups if g["model_id"].startswith("FastWan"))
    assert [p["metrics"]["e2e_s"] for p in wan["points"]] == [9.0, 8.0]


def test_http_backend(tmp_path):
    from fastvideo_tpu.performance.dashboard import DashboardServer

    _seed_store(tmp_path, [9.0, 9.1, 8.9, 12.0])
    server = DashboardServer(str(tmp_path), port=0)
    server.serve_background()
    base = f"http://127.0.0.1:{server.port}"
    try:
        def get(path):
            with urllib.request.urlopen(base + path, timeout=10) as r:
                return json.loads(r.read())

        health = get("/api/performance/health")
        assert health["ok"]
        recs = get("/api/performance/records?days=3650")
        assert recs["count"] == 4
        summary = get("/api/performance/summary")
        assert summary["count"] == 1
        assert summary["rows"][0]["metrics"]["e2e_s"]["current"] == 12.0
        trends = get("/api/performance/trends?model_id=FastWan2.1-T2V-1.3B")
        assert trends["count"] == 1
        assert len(trends["groups"][0]["points"]) == 4

        # refresh picks up records appended after startup
        from fastvideo_tpu.performance.store import append_record

        append_record(_record(7.0, ts="2026-08-18T00:00:00+00:00",
                              sha="c9"), str(tmp_path))
        req = urllib.request.Request(base + "/api/performance/refresh",
                                     method="POST")
        with urllib.request.urlopen(req, timeout=10) as r:
            assert json.loads(r.read())["ok"]
        assert get("/api/performance/records?days=3650")["count"] == 5
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            get("/api/performance/nope")
        assert exc_info.value.code == 404
    finally:
        server.shutdown()


def test_bench_record_normalization():
    from fastvideo_tpu.performance.store import record_from_bench_json

    rec = record_from_bench_json({"metric": "x", "value": 9.12, "unit": "s",
                                  "vs_baseline": 0.55}, commit_sha="deadbee")
    assert rec["e2e_s"] == 9.12
    assert rec["model_id"] and rec["gpu_type"]


def test_dashboard_serves_web_ui(tmp_path):
    """GET / returns the single-file dashboard page (reference analog:
    apps/performance_dashboard frontend)."""
    import urllib.request

    from fastvideo_tpu.performance.dashboard import DashboardServer

    dash = DashboardServer(str(tmp_path), host="127.0.0.1", port=0)
    dash.serve_background()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{dash.port}/", timeout=5) as r:
            assert r.headers["Content-Type"].startswith("text/html")
            page = r.read().decode()
        assert "FastVideo performance" in page
        assert "/api/performance/trends" in page
    finally:
        dash.shutdown()
