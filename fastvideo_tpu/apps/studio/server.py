"""Studio HTTP server: jobs / datasets / settings / gpus routes.

Behavior analog of /root/reference/apps/fastvideo_studio/server.py
(:73-607): the same /api surface over the sqlite store and JobRunner.
Transport: the repo's stdlib ThreadingHTTPServer pattern (no
fastapi/uvicorn in this environment — same as the OpenAI server and the
performance dashboard); ``handle()`` is transport-agnostic and unit-
testable. TPU deviation: /api/gpus reports the JAX device list instead
of nvidia-smi; raw uploads arrive as base64 JSON instead of multipart.
"""

from __future__ import annotations

import base64
import os
import re
import threading
import time
import uuid
from typing import Any

from fastvideo_tpu.apps.studio.database import Database, default_settings
from fastvideo_tpu.apps.studio.job_runner import JobRunner, JobStatus
from fastvideo_tpu.apps.studio.training_config import SUPPORTED_WORKLOADS
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

_VIDEO_EXTS = {".mp4", ".webm", ".mov", ".avi", ".mkv"}

_JOB_RE = re.compile(r"^/api/jobs/([0-9a-f]+)(/(start|stop|logs|video))?$")
_DS_RE = re.compile(r"^/api/datasets/([0-9a-f]+)"
                    r"(/(captions|files)|/media/(.+))?$")


def _path_is_within(child: str, parent: str) -> bool:
    """Reference server.py:161-168 traversal guard."""
    return os.path.commonpath(
        [os.path.abspath(child), os.path.abspath(parent)]
    ) == os.path.abspath(parent)


class StudioServer:
    """Route handler + stdlib HTTP transport."""

    def __init__(self, data_dir: str = "studio_data",
                 db: Database | None = None,
                 runner: JobRunner | None = None,
                 host: str = "127.0.0.1", port: int = 8234):
        os.makedirs(data_dir, exist_ok=True)
        self.data_dir = data_dir
        self.db = db or Database(os.path.join(data_dir, "studio.db"))
        self.runner = runner or JobRunner(
            self.db, outputs_dir=os.path.join(data_dir, "outputs"))
        self.host = host
        self.port = port
        self._httpd = None

    # -- endpoint handlers ---------------------------------------------------

    def handle(self, method: str, path: str, query: dict[str, str],
               body: dict[str, Any] | None = None
               ) -> tuple[int, dict[str, Any]]:
        body = body or {}
        if path in ("/", "/index.html") and method == "GET":
            from fastvideo_tpu.apps.studio.ui import INDEX_HTML

            return 200, {"_inline": INDEX_HTML, "_media_type": "text/html"}
        if path == "/health":
            running = sum(1 for j in self.runner.list_jobs()
                          if j.status == JobStatus.RUNNING)
            return 200, {"status": "ok", "running_jobs": running}
        if path == "/api/settings":
            if method == "GET":
                return 200, self.db.get_settings()
            if method == "PUT":
                unknown = set(body) - set(default_settings())
                if unknown:
                    return 400, {"error":
                                 f"Unknown settings: {sorted(unknown)}"}
                self.db.save_settings(body)
                return 200, self.db.get_settings()
        if path == "/api/gpus" and method == "GET":
            return 200, self._gpus()
        if path == "/api/models" and method == "GET":
            return 200, {"models": self._models()}
        if path == "/api/workloads" and method == "GET":
            return 200, {"workloads": sorted(SUPPORTED_WORKLOADS)}
        if path == "/api/jobs" and method == "GET":
            jobs = self.runner.list_jobs(query.get("job_type") or None)
            return 200, {"jobs": [j.to_dict() for j in jobs]}
        if path == "/api/jobs" and method == "POST":
            return self._create_job(body)
        m = _JOB_RE.match(path)
        if m:
            return self._job_routes(method, m.group(1), m.group(3), query)
        if path == "/api/datasets" and method == "GET":
            return 200, {"datasets": self.db.get_all_datasets()}
        if path == "/api/datasets" and method == "POST":
            return self._create_dataset(body)
        if path == "/api/upload-raw-dataset" and method == "POST":
            return self._upload_raw(body)
        m = _DS_RE.match(path)
        if m:
            return self._dataset_routes(method, m.group(1), m.group(3),
                                        m.group(4), body)
        return 404, {"error": f"unknown path {path}"}

    def _gpus(self) -> dict[str, Any]:
        try:
            import jax

            devices = jax.devices()
            return {"count": len(devices),
                    "devices": [{"id": d.id, "kind": d.device_kind,
                                 "platform": d.platform} for d in devices]}
        except Exception as exc:  # pragma: no cover - env dependent
            return {"count": 0, "devices": [], "error": str(exc)}

    def _models(self) -> list[dict[str, str]]:
        models_dir = self.db.get_settings().get("models_dir") or ""
        out = []
        if models_dir and os.path.isdir(models_dir):
            for name in sorted(os.listdir(models_dir)):
                path = os.path.join(models_dir, name)
                if os.path.isfile(os.path.join(path, "model_index.json")):
                    out.append({"id": path, "name": name})
        return out

    def _create_job(self, body: dict) -> tuple[int, dict]:
        name = str(body.get("name") or "").strip()
        job_type = str(body.get("job_type") or "training")
        if not name:
            return 400, {"error": "name is required"}
        if job_type not in ("training", "inference"):
            return 400, {"error": f"Unknown job_type {job_type!r}"}
        config = dict(body.get("config") or {})
        ds_id = config.get("dataset_id")
        if ds_id:
            ds = self.db.get_dataset(str(ds_id))
            if ds is None:
                return 400, {"error": f"Unknown dataset {ds_id}"}
            config["data_path"] = ds["path"]
        try:
            job = self.runner.create_job(name, job_type, config)
        except ValueError as exc:
            return 400, {"error": str(exc)}
        return 201, job.to_dict()

    def _job_routes(self, method: str, job_id: str, action: str | None,
                    query: dict) -> tuple[int, dict]:
        job = self.runner.get_job(job_id)
        if job is None:
            return 404, {"error": f"Unknown job {job_id}"}
        if action is None:
            if method == "GET":
                return 200, job.to_dict()
            if method == "DELETE":
                try:
                    self.runner.delete_job(job_id)
                except ValueError as exc:
                    return 409, {"error": str(exc)}
                return 200, {"status": "deleted"}
        if action == "start" and method == "POST":
            try:
                return 200, self.runner.start_job(job_id).to_dict()
            except ValueError as exc:
                return 409, {"error": str(exc)}
        if action == "stop" and method == "POST":
            return 200, self.runner.stop_job(job_id).to_dict()
        if action == "logs" and method == "GET":
            after = int(query.get("after", 0) or 0)
            return 200, self.runner.get_job_logs(job_id, after)
        if action == "video" and method == "GET":
            path = os.path.join(job.output_dir, "output.mp4")
            if not os.path.exists(path):
                return 404, {"error": "No video output for this job"}
            return 200, {"_file": path, "_media_type": "video/mp4"}
        return 405, {"error": "method not allowed"}

    def _create_dataset(self, body: dict) -> tuple[int, dict]:
        name = str(body.get("name") or "").strip()
        path = str(body.get("path") or "").strip()
        if not name or not path:
            return 400, {"error": "name and path are required"}
        if not os.path.exists(path):
            return 400, {"error": f"Dataset path does not exist: {path}"}
        num_files = total = 0
        for root, _, files in os.walk(path):
            for f in files:
                num_files += 1
                total += os.path.getsize(os.path.join(root, f))
        ds = {"id": uuid.uuid4().hex[:12], "name": name, "path": path,
              "kind": str(body.get("kind") or "raw"),
              "num_files": num_files, "total_bytes": total,
              "created_at": time.time()}
        self.db.insert_dataset(ds)
        return 201, ds

    def _upload_raw(self, body: dict) -> tuple[int, dict]:
        """JSON {files: [{name, content_b64}]} -> staging dir
        (reference :178-239 multipart upload; base64 deviation noted)."""
        files = body.get("files") or []
        videos = [f for f in files
                  if os.path.splitext(str(f.get("name") or ""))[1].lower()
                  in _VIDEO_EXTS]
        if not videos:
            return 400, {"error": "No video files in upload"}
        stage = os.path.join(self.data_dir, "staging",
                             uuid.uuid4().hex[:12])
        os.makedirs(stage, exist_ok=True)
        for f in videos:
            base = os.path.basename(str(f["name"]))
            dest = os.path.join(stage, base)
            if not _path_is_within(dest, stage):
                return 400, {"error": f"Bad file name {f['name']!r}"}
            with open(dest, "wb") as out:
                out.write(base64.b64decode(f.get("content_b64") or ""))
        return 200, {"staging_path": stage, "num_files": len(videos)}

    def _dataset_routes(self, method: str, ds_id: str, action: str | None,
                        media: str | None, body: dict) -> tuple[int, dict]:
        ds = self.db.get_dataset(ds_id)
        if ds is None:
            return 404, {"error": f"Unknown dataset {ds_id}"}
        if media is not None and method == "GET":
            path = os.path.join(ds["path"], media)
            if not _path_is_within(path, ds["path"]):
                return 400, {"error": "Path escapes the dataset directory"}
            if not os.path.exists(path):
                return 404, {"error": f"No such file {media}"}
            return 200, {"_file": path,
                         "_media_type": "application/octet-stream"}
        if action is None:
            if method == "GET":
                ds["captions"] = self.db.get_dataset_captions(ds_id)
                return 200, ds
            if method == "DELETE":
                self.db.delete_dataset(ds_id)
                return 200, {"status": "deleted"}
        if action == "captions" and method == "PUT":
            file_name = body.get("file_name")
            if not file_name:
                return 400, {"error": "file_name is required"}
            self.db.upsert_dataset_caption(ds_id, str(file_name),
                                           str(body.get("caption") or ""))
            return 200, {"status": "ok"}
        if action == "files" and method == "GET":
            files = sorted(
                os.path.relpath(os.path.join(r, f), ds["path"])
                for r, _, fs in os.walk(ds["path"]) for f in fs)
            return 200, {"files": files}
        return 405, {"error": "method not allowed"}

    # -- transport -----------------------------------------------------------

    def _build_httpd(self):
        import json as _json
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        from urllib.parse import parse_qsl, urlparse

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def _respond(self, method):
                parsed = urlparse(self.path)
                query = dict(parse_qsl(parsed.query))
                body = None
                length = int(self.headers.get("Content-Length") or 0)
                if length:
                    try:
                        body = _json.loads(self.rfile.read(length))
                    except _json.JSONDecodeError:
                        body = None
                try:
                    status, payload = outer.handle(method, parsed.path,
                                                   query, body)
                except Exception as exc:
                    status, payload = 500, {"error": str(exc)}
                if isinstance(payload, dict) and "_inline" in payload:
                    data = payload["_inline"].encode()
                    self.send_response(status)
                    self.send_header("Content-Type",
                                     payload.get("_media_type", "text/html"))
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                if isinstance(payload, dict) and "_file" in payload:
                    with open(payload["_file"], "rb") as f:
                        data = f.read()
                    self.send_response(status)
                    self.send_header("Content-Type",
                                     payload.get("_media_type",
                                                 "application/octet-stream"))
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                raw = _json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def do_GET(self):  # noqa: N802
                self._respond("GET")

            def do_POST(self):  # noqa: N802
                self._respond("POST")

            def do_PUT(self):  # noqa: N802
                self._respond("PUT")

            def do_DELETE(self):  # noqa: N802
                self._respond("DELETE")

            def log_message(self, fmt, *args):
                pass

        return ThreadingHTTPServer((self.host, self.port), Handler)

    def serve_forever(self) -> None:
        self._httpd = self._build_httpd()
        self.port = self._httpd.server_address[1]
        self._httpd.serve_forever()

    def serve_background(self) -> threading.Thread:
        self._httpd = self._build_httpd()
        self.port = self._httpd.server_address[1]
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()


def main() -> None:  # pragma: no cover - manual entrypoint
    import argparse

    p = argparse.ArgumentParser("fastvideo studio")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8234)
    p.add_argument("--data-dir", default="studio_data")
    ns = p.parse_args()
    StudioServer(ns.data_dir, host=ns.host, port=ns.port).serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
