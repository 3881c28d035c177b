"""Performance dashboard: data transforms + FastAPI backend.

Behavioral reference: /root/reference/fastvideo/performance_dashboard/
(service.py:1-253 transforms; api.py:1-220 endpoints): records group into
comparison cohorts, each cohort's latest run is compared against the
median of its last-N baseline-eligible predecessors per metric policy,
and three endpoints expose records / latest summary / trend series.
Zero-egress deviation: ``refresh`` rescans the local tracking root
instead of re-syncing a HuggingFace dataset.
"""

from __future__ import annotations

import statistics
import threading
from collections import defaultdict
from datetime import datetime, timedelta, timezone
from typing import Any

from fastvideo_tpu.performance.metric_policy import (regression_delta,
                                                     resolve_metric_policies)
from fastvideo_tpu.performance.store import (DEFAULT_TRACKING_ROOT,
                                             is_baseline_eligible_record,
                                             load_records, safe_float)

Record = dict[str, Any]

COHORT_KEYS = ("workload_id", "variant_id", "benchmark_version",
               "hardware_profile_id", "software_profile_id")


def parse_timestamp(value: Any) -> datetime | None:
    if not value:
        return None
    if isinstance(value, datetime):
        ts = value
    else:
        try:
            ts = datetime.fromisoformat(str(value))
        except ValueError:
            return None
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return ts.astimezone(timezone.utc)


def record_sort_key(record: Record):
    ts = parse_timestamp(record.get("timestamp"))
    return (ts or datetime.min.replace(tzinfo=timezone.utc),
            str(record.get("commit_sha") or ""))


def record_run_source(record: Record) -> str:
    v = str(record.get("run_source") or "unknown")
    return v if v in {"pr", "local", "scheduled_main", "unknown"} \
        else "unknown"


def filter_records(records: list[Record], *, model_id: str | None = None,
                   gpu_type: str | None = None,
                   run_source: str | None = None,
                   success: bool | None = None) -> list[Record]:
    out = records
    if model_id:
        out = [r for r in out if r.get("model_id") == model_id]
    if gpu_type:
        out = [r for r in out if r.get("gpu_type") == gpu_type]
    if run_source:
        out = [r for r in out if record_run_source(r) == run_source]
    if success is not None:
        out = [r for r in out if bool(r.get("success", True)) == success]
    return sorted(out, key=record_sort_key)


def cohort_key(record: Record) -> tuple[str, ...]:
    return (str(record.get("model_id") or "unknown"),
            str(record.get("gpu_type") or "unknown"),
            *(str(record.get(k) or "") for k in COHORT_KEYS))


def group_by_cohort(records: list[Record]) -> dict[tuple, list[Record]]:
    groups: dict[tuple, list[Record]] = defaultdict(list)
    for r in records:
        groups[cohort_key(r)].append(r)
    return {k: sorted(v, key=record_sort_key) for k, v in groups.items()}


def baseline_value(records: list[Record], key: str) -> float | None:
    vals = [safe_float(r.get(key)) for r in records]
    vals = [v for v in vals if v is not None]
    return float(statistics.median(vals)) if vals else None


def build_latest_summary(records: list[Record], *,
                         baseline_window: int = 5,
                         run_source: str | None = None) -> list[Record]:
    """One row per cohort: latest run vs the median of its last-N
    baseline-eligible predecessors, per metric policy."""
    rows: list[Record] = []
    for group in group_by_cohort(records).values():
        candidates = group
        if run_source:
            candidates = [r for r in group
                          if record_run_source(r) == run_source]
        if not candidates:
            continue
        latest = candidates[-1]
        latest_idx = next(i for i, r in enumerate(group) if r is latest)
        pool = [r for r in group[:latest_idx]
                if r.get("success", True) and is_baseline_eligible_record(r)]
        baseline_records = pool[-baseline_window:]
        policies = resolve_metric_policies(
            latest.get("regression_thresholds"))

        metrics: dict[str, Record] = {}
        regressions: list[float] = []
        failing: list[str] = []
        exceeded: list[str] = []
        for policy in policies:
            current = safe_float(latest.get(policy.key))
            baseline = baseline_value(baseline_records, policy.key)
            delta = None
            if current is not None and baseline is not None:
                delta = regression_delta(policy, current, baseline)
            metrics[policy.key] = {
                "current": current,
                "baseline": baseline,
                "regression_pct":
                    None if delta is None else delta.percent * 100.0,
                "absolute_delta":
                    None if delta is None else delta.absolute,
                "threshold_percent": policy.threshold_percent * 100.0,
                "threshold_absolute": policy.threshold_absolute,
                "gated": policy.gated,
                "threshold_exceeded":
                    False if delta is None else delta.threshold_exceeded,
                "regressed": False if delta is None else delta.regressed,
                "label": policy.label,
                "lower_is_better": policy.lower_is_better,
                "precision": policy.precision,
            }
            if delta is not None:
                regressions.append(delta.percent * 100.0)
                if delta.threshold_exceeded:
                    exceeded.append(policy.key)
                if delta.regressed:
                    failing.append(policy.key)

        success = bool(latest.get("success", True))
        rows.append({
            "model_id": str(latest.get("model_id") or "unknown"),
            "gpu_type": str(latest.get("gpu_type") or "unknown"),
            "timestamp": latest.get("timestamp"),
            "commit_sha": latest.get("commit_sha"),
            "run_source": record_run_source(latest),
            "baseline_eligible": is_baseline_eligible_record(latest),
            "success": success,
            "baseline_n": len(baseline_records),
            "worst_regression_pct":
                max(regressions) if regressions else None,
            "threshold_exceeded_metrics": exceeded,
            "failing_metrics": failing,
            "computed_regression_status": "fail" if failing else "pass",
            "status": "pass" if success else "fail",
            "metrics": metrics,
        })
    return sorted(rows, key=lambda r: (r["status"] != "fail",
                                       r["model_id"], r["gpu_type"]))


def build_trends(records: list[Record]) -> list[Record]:
    trends: list[Record] = []
    for group in group_by_cohort(records).values():
        latest = group[-1]
        points = []
        for r in group:
            policies = resolve_metric_policies(
                r.get("regression_thresholds"))
            points.append({
                "timestamp": r.get("timestamp"),
                "commit_sha": r.get("commit_sha"),
                "run_source": record_run_source(r),
                "success": bool(r.get("success", True)),
                "metrics": {p.key: safe_float(r.get(p.key))
                            for p in policies},
            })
        trends.append({
            "model_id": str(latest.get("model_id") or "unknown"),
            "gpu_type": str(latest.get("gpu_type") or "unknown"),
            "points": points,
        })
    return sorted(trends, key=lambda g: (g["model_id"], g["gpu_type"]))


class PerformanceDataStore:
    """Disk-backed record cache with an explicit rescan."""

    def __init__(self, tracking_root: str | None = None) -> None:
        self.tracking_root = tracking_root or DEFAULT_TRACKING_ROOT
        self._lock = threading.RLock()
        self.last_sync_at: str | None = None
        self.last_sync_error: str | None = None
        self._cache: list[Record] | None = None

    def sync(self) -> dict[str, Any]:
        with self._lock:
            try:
                self._cache = load_records(self.tracking_root)
                self.last_sync_at = datetime.now(timezone.utc).isoformat()
                self.last_sync_error = None
            except Exception as exc:  # surfaced in health, not raised
                self.last_sync_error = str(exc)
            return self.health()

    def load(self, *, days: int | None = None,
             successful_only: bool = False) -> list[Record]:
        with self._lock:
            if self._cache is None:
                self.sync()
            records = list(self._cache or [])
        # filter the CACHE (refreshed via /sync) instead of re-globbing
        # the whole record tree on every request
        if successful_only:
            records = [r for r in records if r.get("success", True)]
        if days:
            cutoff = datetime.now(timezone.utc) - timedelta(days=days)
            kept = []
            for r in records:
                try:
                    ts = datetime.fromisoformat(str(r.get("timestamp")))
                except (TypeError, ValueError):
                    ts = None
                if ts is not None and ts.tzinfo is None:
                    ts = ts.replace(tzinfo=timezone.utc)
                if ts is None or ts >= cutoff:
                    kept.append(r)
            records = kept
        return records

    def health(self) -> dict[str, Any]:
        return {
            "ok": self.last_sync_error is None,
            "tracking_root": self.tracking_root,
            "last_sync_at": self.last_sync_at,
            "last_sync_error": self.last_sync_error,
        }


class DashboardServer:
    """Stdlib HTTP backend for the dashboard (same transport as the
    OpenAI server — this environment ships no fastapi/uvicorn).

    GET  /api/performance/health
    GET  /api/performance/records?days=&model_id=&gpu_type=&run_source=&success=
    GET  /api/performance/summary?model_id=&gpu_type=&run_source=
    GET  /api/performance/trends?days=&model_id=&gpu_type=&run_source=
    POST /api/performance/refresh
    """

    def __init__(self, tracking_root: str | None = None,
                 host: str = "127.0.0.1", port: int = 8200) -> None:
        self.store = PerformanceDataStore(tracking_root)
        self.host = host
        self.port = port
        self._httpd = None

    # -- endpoint handlers (dict payloads; transport-agnostic) -------------

    def handle(self, method: str, path: str,
               query: dict[str, str]) -> tuple[int, dict[str, Any]]:
        def q(name, default=None):
            return query.get(name) or default

        days = int(q("days", 90) or 90)
        model_id, gpu_type = q("model_id"), q("gpu_type")
        run_source = q("run_source")
        if method == "GET" and path in ("/", "/index.html"):
            from fastvideo_tpu.performance.dashboard_ui import INDEX_HTML

            return 200, {"_inline": INDEX_HTML, "_media_type": "text/html"}
        if method == "POST" and path == "/api/performance/refresh":
            return 200, self.store.sync()
        if method != "GET":
            return 405, {"error": "method not allowed"}
        if path == "/api/performance/health":
            return 200, self.store.health()
        if path == "/api/performance/records":
            success = q("success")
            filtered = filter_records(
                self.store.load(days=days), model_id=model_id,
                gpu_type=gpu_type, run_source=run_source,
                success=None if success is None
                else success.lower() in ("1", "true", "yes"))
            return 200, {"records": filtered, "count": len(filtered),
                         "sync": self.store.health()}
        if path == "/api/performance/summary":
            # latest/baseline ignores the trend window (reference api.py)
            rows = [
                row for row in build_latest_summary(
                    self.store.load(), run_source=run_source)
                if (not model_id or row["model_id"] == model_id)
                and (not gpu_type or row["gpu_type"] == gpu_type)
            ]
            return 200, {
                "rows": rows, "count": len(rows),
                "status_counts": {
                    "pass": sum(1 for r in rows if r["status"] == "pass"),
                    "fail": sum(1 for r in rows if r["status"] == "fail"),
                },
                "sync": self.store.health(),
            }
        if path == "/api/performance/trends":
            filtered = filter_records(self.store.load(days=days),
                                      run_source=run_source)
            groups = [
                g for g in build_trends(filtered)
                if (not model_id or g["model_id"] == model_id)
                and (not gpu_type or g["gpu_type"] == gpu_type)
            ]
            return 200, {"groups": groups, "count": len(groups),
                         "sync": self.store.health()}
        return 404, {"error": f"unknown path {path}"}

    # -- transport ---------------------------------------------------------

    def _build_httpd(self):
        import json as _json
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        from urllib.parse import parse_qsl, urlparse

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def _respond(self, method):
                parsed = urlparse(self.path)
                query = dict(parse_qsl(parsed.query))
                try:
                    status, payload = outer.handle(method, parsed.path,
                                                   query)
                except Exception as exc:  # surface as 500 JSON
                    status, payload = 500, {"error": str(exc)}
                if isinstance(payload, dict) and "_inline" in payload:
                    data = payload["_inline"].encode()
                    self.send_response(status)
                    self.send_header(
                        "Content-Type",
                        payload.get("_media_type", "text/html"))
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                body = _json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 (http.server API)
                self._respond("GET")

            def do_POST(self):  # noqa: N802
                self._respond("POST")

            def log_message(self, fmt, *args):
                pass

        return ThreadingHTTPServer((self.host, self.port), Handler)

    def serve_forever(self) -> None:
        self._httpd = self._build_httpd()
        self.port = self._httpd.server_address[1]
        self._httpd.serve_forever()

    def serve_background(self) -> "threading.Thread":
        self._httpd = self._build_httpd()
        self.port = self._httpd.server_address[1]
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()


def run_dashboard(host: str = "127.0.0.1", port: int = 8200,
                  tracking_root: str | None = None) -> None:
    server = DashboardServer(tracking_root, host=host, port=port)
    server.serve_forever()
