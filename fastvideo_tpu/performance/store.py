"""Local performance record store.

Behavioral reference: /root/reference/fastvideo/performance/hf_store.py —
the reference syncs normalized benchmark records from a HuggingFace
dataset repo; under zero egress the store is a LOCAL tracking root:
one JSON file per run under ``<root>/records/YYYY/MM/``, append-only.

Record schema (normalized): model_id, gpu_type (chip), timestamp
(ISO-8601), commit_sha, run_source (pr|local|scheduled_main), success,
plus metric keys from metric_policy (e2e_s, dit_time_s, ...) and an
optional ``regression_thresholds`` override map.
"""

from __future__ import annotations

import glob
import json
import os
import uuid
from datetime import datetime, timedelta, timezone
from typing import Any

DEFAULT_TRACKING_ROOT = os.path.expanduser(
    os.environ.get("FASTVIDEO_PERF_TRACKING_ROOT",
                   "~/.cache/fastvideo_tpu/perf_tracking"))

_ELIGIBLE_SOURCES = {"local", "scheduled_main"}


def safe_float(value: Any) -> float | None:
    if value is None or isinstance(value, bool):
        return None
    try:
        f = float(value)
    except (TypeError, ValueError):
        return None
    return f if f == f else None  # drop NaN


def is_baseline_eligible_record(record: dict[str, Any]) -> bool:
    """PR runs don't move the rolling baseline (reference hf_store)."""
    return str(record.get("run_source") or "local") in _ELIGIBLE_SOURCES


def append_record(record: dict[str, Any],
                  tracking_root: str | None = None) -> str:
    """Write one normalized record; fills timestamp/run_source defaults.
    Returns the file path."""
    root = tracking_root or DEFAULT_TRACKING_ROOT
    record = dict(record)
    ts = record.get("timestamp") or datetime.now(
        timezone.utc).isoformat()
    record["timestamp"] = ts
    record.setdefault("run_source", "local")
    record.setdefault("success", True)
    dt = datetime.fromisoformat(str(ts))
    sub = os.path.join(root, "records", f"{dt.year:04d}", f"{dt.month:02d}")
    os.makedirs(sub, exist_ok=True)
    path = os.path.join(
        sub, f"{dt.strftime('%Y%m%dT%H%M%S')}_{uuid.uuid4().hex[:8]}.json")
    with open(path, "w") as fh:
        json.dump(record, fh, indent=2)
    return path


def load_records(tracking_root: str | None = None, *,
                 days: int | None = None,
                 successful_only: bool = False) -> list[dict[str, Any]]:
    root = tracking_root or DEFAULT_TRACKING_ROOT
    pattern = os.path.join(root, "records", "**", "*.json")
    cutoff = (datetime.now(timezone.utc) - timedelta(days=days)
              if days else None)
    records: list[dict[str, Any]] = []
    for path in sorted(glob.glob(pattern, recursive=True)):
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rec, dict):
            continue
        if successful_only and not rec.get("success", True):
            continue
        if cutoff is not None:
            try:
                ts = datetime.fromisoformat(str(rec.get("timestamp")))
            except (TypeError, ValueError):
                ts = None
            if ts is not None and ts.tzinfo is None:
                ts = ts.replace(tzinfo=timezone.utc)
            if ts is not None and ts < cutoff:
                continue
        records.append(rec)
    return records


def record_from_bench_json(bench: dict[str, Any], *,
                           model_id: str = "FastWan2.1-T2V-1.3B",
                           gpu_type: str = "tpu",
                           commit_sha: str | None = None) -> dict[str, Any]:
    """Normalize a bench.py / BENCH_r{N}.json payload into a record."""
    rec: dict[str, Any] = {
        "model_id": model_id,
        "gpu_type": gpu_type,
        "commit_sha": commit_sha,
        "run_source": "local",
        "success": True,
    }
    if bench.get("unit") in ("s", "seconds"):
        rec["e2e_s"] = safe_float(bench.get("value"))
    for src, dst in (("text_s", "text_encoder_time_s"),
                     ("dit_s", "dit_time_s"),
                     ("decode_s", "vae_decode_time_s"),
                     ("e2e_s", "e2e_s"), ("memory_gb", "memory_gb"),
                     ("steps_per_s", "steps_per_s")):
        v = safe_float(bench.get(src))
        if v is not None:
            rec[dst] = v
    return rec
