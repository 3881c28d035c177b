"""Studio sqlite store: jobs, datasets, captions, settings.

Behavior analog of /root/reference/apps/fastvideo_studio/database.py
(:134-631): same three tables + settings key-value store, additive
column migration, dict-in/dict-out API. JSON-typed columns hold the
free-form job config.
"""

from __future__ import annotations

import json
import sqlite3
import threading
import time
from pathlib import Path
from typing import Any

_JOB_COLUMNS = {
    "id": "TEXT PRIMARY KEY",
    "name": "TEXT",
    "job_type": "TEXT",            # training | inference | preprocess
    "workload_type": "TEXT",
    "status": "TEXT",
    "model_id": "TEXT",
    "config": "TEXT",              # JSON: free-form creation request
    "output_dir": "TEXT",
    "error": "TEXT",
    "progress": "REAL",
    "created_at": "REAL",
    "started_at": "REAL",
    "finished_at": "REAL",
}

_DATASET_COLUMNS = {
    "id": "TEXT PRIMARY KEY",
    "name": "TEXT",
    "path": "TEXT",
    "kind": "TEXT",                # raw | parquet
    "num_files": "INTEGER",
    "total_bytes": "INTEGER",
    "created_at": "REAL",
}


def default_settings() -> dict[str, Any]:
    """Reference database.py:604 default_settings_dict analog."""
    return {
        "models_dir": "",
        "datasets_dir": "",
        "outputs_dir": "outputs",
        "default_num_gpus": 1,
        "hf_token": "",
    }


def _ensure_columns(conn: sqlite3.Connection, table: str,
                    columns: dict[str, str]) -> None:
    have = {r[1] for r in conn.execute(f"PRAGMA table_info({table})")}
    for col, sql_type in columns.items():
        if col not in have:
            conn.execute(
                f"ALTER TABLE {table} ADD COLUMN {col} {sql_type.replace('PRIMARY KEY', '')}")


class Database:
    """Thread-safe sqlite wrapper (one connection, one lock)."""

    def __init__(self, db_path: str | Path):
        self.db_path = Path(db_path)
        self.db_path.parent.mkdir(parents=True, exist_ok=True)
        self._lock = threading.Lock()
        self._conn = sqlite3.connect(str(self.db_path),
                                     check_same_thread=False)
        self._conn.row_factory = sqlite3.Row
        self._init_schema()

    def _init_schema(self) -> None:
        with self._lock, self._conn:
            c = self._conn
            c.execute("CREATE TABLE IF NOT EXISTS jobs (id TEXT PRIMARY KEY)")
            c.execute(
                "CREATE TABLE IF NOT EXISTS datasets (id TEXT PRIMARY KEY)")
            c.execute("CREATE TABLE IF NOT EXISTS captions ("
                      "dataset_id TEXT, file_name TEXT, caption TEXT, "
                      "PRIMARY KEY (dataset_id, file_name))")
            c.execute("CREATE TABLE IF NOT EXISTS settings ("
                      "key TEXT PRIMARY KEY, value TEXT)")
            _ensure_columns(c, "jobs", _JOB_COLUMNS)
            _ensure_columns(c, "datasets", _DATASET_COLUMNS)

    # -- jobs ----------------------------------------------------------------

    def insert_job(self, job: dict[str, Any]) -> None:
        row = {k: job.get(k) for k in _JOB_COLUMNS}
        row["config"] = json.dumps(job.get("config") or {})
        row.setdefault("created_at", time.time())
        if row["created_at"] is None:
            row["created_at"] = time.time()
        cols = ", ".join(row)
        marks = ", ".join("?" for _ in row)
        with self._lock, self._conn:
            self._conn.execute(
                f"INSERT INTO jobs ({cols}) VALUES ({marks})",
                tuple(row.values()))

    def update_job(self, job_id: str, updates: dict[str, Any]) -> None:
        updates = dict(updates)
        if "config" in updates:
            updates["config"] = json.dumps(updates["config"] or {})
        unknown = set(updates) - set(_JOB_COLUMNS)
        if unknown:
            raise ValueError(f"Unknown job columns: {sorted(unknown)}")
        sets = ", ".join(f"{k} = ?" for k in updates)
        with self._lock, self._conn:
            self._conn.execute(f"UPDATE jobs SET {sets} WHERE id = ?",
                               (*updates.values(), job_id))

    def delete_job(self, job_id: str) -> bool:
        with self._lock, self._conn:
            cur = self._conn.execute("DELETE FROM jobs WHERE id = ?",
                                     (job_id,))
            return cur.rowcount > 0

    def get_job(self, job_id: str) -> dict[str, Any] | None:
        with self._lock:
            row = self._conn.execute("SELECT * FROM jobs WHERE id = ?",
                                     (job_id,)).fetchone()
        return _row_to_job(row) if row else None

    def get_all_jobs(self,
                     job_type: str | None = None) -> list[dict[str, Any]]:
        sql = "SELECT * FROM jobs"
        params: tuple = ()
        if job_type:
            sql += " WHERE job_type = ?"
            params = (job_type,)
        sql += " ORDER BY created_at DESC"
        with self._lock:
            rows = self._conn.execute(sql, params).fetchall()
        return [_row_to_job(r) for r in rows]

    # -- datasets ------------------------------------------------------------

    def insert_dataset(self, dataset: dict[str, Any]) -> None:
        row = {k: dataset.get(k) for k in _DATASET_COLUMNS}
        if row.get("created_at") is None:
            row["created_at"] = time.time()
        cols = ", ".join(row)
        marks = ", ".join("?" for _ in row)
        with self._lock, self._conn:
            self._conn.execute(
                f"INSERT INTO datasets ({cols}) VALUES ({marks})",
                tuple(row.values()))

    def get_dataset(self, dataset_id: str) -> dict[str, Any] | None:
        with self._lock:
            row = self._conn.execute("SELECT * FROM datasets WHERE id = ?",
                                     (dataset_id,)).fetchone()
        return dict(row) if row else None

    def get_all_datasets(self) -> list[dict[str, Any]]:
        with self._lock:
            rows = self._conn.execute(
                "SELECT * FROM datasets ORDER BY created_at DESC").fetchall()
        return [dict(r) for r in rows]

    def delete_dataset(self, dataset_id: str) -> bool:
        with self._lock, self._conn:
            self._conn.execute("DELETE FROM captions WHERE dataset_id = ?",
                               (dataset_id,))
            cur = self._conn.execute("DELETE FROM datasets WHERE id = ?",
                                     (dataset_id,))
            return cur.rowcount > 0

    # -- captions ------------------------------------------------------------

    def upsert_dataset_caption(self, dataset_id: str, file_name: str,
                               caption: str) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "INSERT INTO captions (dataset_id, file_name, caption) "
                "VALUES (?, ?, ?) ON CONFLICT(dataset_id, file_name) "
                "DO UPDATE SET caption = excluded.caption",
                (dataset_id, file_name, caption))

    def get_dataset_captions(self, dataset_id: str) -> dict[str, str]:
        with self._lock:
            rows = self._conn.execute(
                "SELECT file_name, caption FROM captions "
                "WHERE dataset_id = ?", (dataset_id,)).fetchall()
        return {r["file_name"]: r["caption"] for r in rows}

    # -- settings ------------------------------------------------------------

    def get_settings(self) -> dict[str, Any]:
        settings = default_settings()
        with self._lock:
            rows = self._conn.execute(
                "SELECT key, value FROM settings").fetchall()
        for r in rows:
            try:
                settings[r["key"]] = json.loads(r["value"])
            except (json.JSONDecodeError, TypeError):
                settings[r["key"]] = r["value"]
        return settings

    def save_settings(self, settings: dict[str, Any]) -> None:
        with self._lock, self._conn:
            for k, v in settings.items():
                self._conn.execute(
                    "INSERT INTO settings (key, value) VALUES (?, ?) "
                    "ON CONFLICT(key) DO UPDATE SET value = excluded.value",
                    (k, json.dumps(v)))

    def close(self) -> None:
        with self._lock:
            self._conn.close()


def _row_to_job(row: sqlite3.Row) -> dict[str, Any]:
    job = dict(row)
    try:
        job["config"] = json.loads(job.get("config") or "{}")
    except json.JSONDecodeError:
        job["config"] = {}
    return job
