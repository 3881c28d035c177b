"""OpenAI-compatible video generation server.

Analog of /root/reference/fastvideo/entrypoints/openai/api_server.py:72-134
(/v1/videos create+poll, /v1/models, /health). Built on the stdlib
ThreadingHTTPServer — this environment ships no fastapi/uvicorn, and the
endpoint surface is small; generation runs on a single background worker
(the TPU mesh is a serial resource).
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class VideoStore:
    """In-memory job store (reference video_api.py background stores)."""

    def __init__(self) -> None:
        self._jobs: dict[str, dict[str, Any]] = {}
        self._lock = threading.Lock()

    def create(self, request: dict) -> dict:
        job = {
            "id": f"video_{uuid.uuid4().hex[:12]}",
            "object": "video",
            "status": "queued",
            "created_at": int(time.time()),
            "request": request,
            "progress": 0,
            "error": None,
            "video_path": None,
        }
        with self._lock:
            self._jobs[job["id"]] = job
        return job

    def get(self, job_id: str) -> dict | None:
        with self._lock:
            return self._jobs.get(job_id)

    def update(self, job_id: str, **fields) -> None:
        with self._lock:
            self._jobs[job_id].update(fields)

    def public(self, job: dict) -> dict:
        return {k: v for k, v in job.items() if k != "request"}


class GenerationWorker(threading.Thread):
    def __init__(self, generator, store: VideoStore):
        super().__init__(daemon=True)
        self.generator = generator
        self.store = store
        self.q: queue.Queue[str] = queue.Queue()

    def submit(self, job_id: str) -> None:
        self.q.put(job_id)

    def run(self) -> None:
        while True:
            job_id = self.q.get()
            if job_id is None:
                return
            job = self.store.get(job_id)
            self.store.update(job_id, status="in_progress")
            try:
                req = job["request"]
                if "sampling" in req or "output" in req or "inputs" in req:
                    # typed api.GenerationRequest body (reference
                    # entrypoints/openai/video_api.py nested schema)
                    from fastvideo_tpu.api.parser import parse_dataclass
                    from fastvideo_tpu.api.schema import (GenerationRequest,
                                                          generation_kwargs)

                    typed = parse_dataclass(GenerationRequest, req)
                    kwargs = generation_kwargs(typed)
                    kwargs["save_video"] = True
                    kwargs.pop("return_frames", None)
                    result = self.generator.generate_video(
                        prompt=typed.prompt or "", **kwargs)
                else:
                    result = self.generator.generate_video(
                        prompt=req.get("prompt", ""),
                        negative_prompt=req.get("negative_prompt"),
                        height=int(req.get("height", 480)),
                        width=int(req.get("width", 832)),
                        num_frames=int(req.get("num_frames", 81)),
                        num_inference_steps=int(
                            req.get("steps",
                                    req.get("num_inference_steps", 50))),
                        guidance_scale=float(req.get("guidance_scale", 5.0)),
                        seed=int(req.get("seed", 1024)),
                        save_video=True,
                        output_path=req.get("output_path", "outputs/"),
                    )
                self.store.update(job_id, status="completed", progress=100,
                                  video_path=result.get("video_path"),
                                  generation_time=result.get(
                                      "generation_time"))
            except Exception as e:  # pragma: no cover
                logger.exception("generation failed")
                self.store.update(job_id, status="failed", error=str(e))


def make_handler(model_id: str, store: VideoStore, worker: GenerationWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            logger.debug(fmt % args)

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            elif self.path == "/v1/models":
                self._send(200, {
                    "object": "list",
                    "data": [{"id": model_id, "object": "model",
                              "owned_by": "fastvideo_tpu"}],
                })
            elif self.path.startswith("/v1/videos/"):
                job = store.get(self.path.rsplit("/", 1)[-1])
                if job is None:
                    self._send(404, {"error": "not found"})
                else:
                    self._send(200, store.public(job))
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self) -> None:
            if self.path not in ("/v1/videos", "/v1/videos/generations"):
                self._send(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", "0"))
            try:
                request = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid json"})
                return
            if not request.get("prompt"):
                self._send(400, {"error": "prompt required"})
                return
            job = store.create(request)
            worker.submit(job["id"])
            self._send(200, store.public(job))

    return Handler


class VideoAPIServer:
    def __init__(self, generator, model_id: str = "fastvideo-tpu",
                 host: str = "0.0.0.0", port: int = 8000):
        self.store = VideoStore()
        self.worker = GenerationWorker(generator, self.store)
        self.worker.start()
        handler = make_handler(model_id, self.store, self.worker)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]

    def serve_forever(self) -> None:
        logger.info("Serving on :%d", self.port)
        self.httpd.serve_forever()

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.worker.q.put(None)


def run_server(model_path: str, host: str = "0.0.0.0", port: int = 8000,
               num_gpus: int = 1, **kwargs) -> None:
    from fastvideo_tpu import VideoGenerator

    generator = VideoGenerator.from_pretrained(model_path,
                                               num_gpus=num_gpus, **kwargs)
    server = VideoAPIServer(generator, model_id=model_path, host=host,
                            port=port)
    server.serve_forever()
