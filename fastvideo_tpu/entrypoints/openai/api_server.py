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

    def create(self, request: dict, kind: str = "video") -> dict:
        job = {
            "id": f"{kind}_{uuid.uuid4().hex[:12]}",
            "object": kind,
            "kind": kind,
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
    # pending-job bound: one chip serves one request at a time, so an
    # unbounded queue just converts a POST burst into unbounded memory and
    # client timeouts; past this depth the server answers 429 instead
    DEFAULT_MAX_QUEUE_DEPTH = 8

    def __init__(self, generator, store: VideoStore,
                 max_queue_depth: int | None = None):
        super().__init__(daemon=True)
        self.generator = generator
        self.store = store
        depth = (self.DEFAULT_MAX_QUEUE_DEPTH
                 if max_queue_depth is None else int(max_queue_depth))
        self.q: queue.Queue[str] = queue.Queue(maxsize=depth)

    def submit(self, job_id: str) -> bool:
        """Enqueue; False when the server is at capacity (caller 429s)."""
        try:
            self.q.put_nowait(job_id)
            return True
        except queue.Full:
            return False

    def run(self) -> None:
        while True:
            job_id = self.q.get()
            if job_id is None:
                return
            job = self.store.get(job_id)
            self.store.update(job_id, status="in_progress")
            try:
                req = job["request"]
                if job.get("kind") == "image":
                    self._run_image(job_id, req)
                    continue
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

    def _run_image(self, job_id: str, req: dict) -> None:
        """/v1/images(+/edits) jobs (reference image_api.py:89-256):
        one-frame generation saved as PNG."""
        import os

        try:
            size = req.get("size") or "1024x1024"
            w, h = (int(v) for v in size.lower().split("x"))
            kwargs: dict[str, Any] = dict(
                prompt=req.get("prompt", ""),
                negative_prompt=req.get("negative_prompt"),
                height=h, width=w, num_frames=1,
                num_inference_steps=int(req.get("num_inference_steps", 28)),
                guidance_scale=float(req.get("guidance_scale", 4.0)),
                seed=int(req.get("seed", 1024)),
                save_video=False,
            )
            if req.get("_pil_image") is not None:  # /v1/images/edits
                kwargs["pil_image"] = req["_pil_image"]
            result = self.generator.generate_video(**kwargs)
            frame = result["frames"][0][0]  # [H, W, 3] uint8
            out_dir = req.get("output_path", "outputs/images")
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, f"{job_id}.png")
            import PIL.Image

            PIL.Image.fromarray(frame).save(path)
            self.store.update(job_id, status="completed", progress=100,
                              video_path=path,
                              generation_time=result.get("generation_time"))
        except Exception as e:  # pragma: no cover
            logger.exception("image generation failed")
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
            elif (self.path.startswith("/v1/images/")
                  and self.path.endswith("/content")):
                # reference image_api.py:256 GET /{image_id}/content
                image_id = self.path.split("/")[3]
                job = store.get(image_id)
                if job is None or not job.get("video_path"):
                    self._send(404, {"error": "not found"})
                    return
                with open(job["video_path"], "rb") as fh:
                    body = fh.read()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "not found"})

        def _read_json(self) -> dict | None:
            length = int(self.headers.get("Content-Length", "0"))
            try:
                return json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid json"})
                return None

        def _image_request(self, request: dict, *, edit: bool) -> None:
            """Synchronous image generation (reference image_api.py:89-154
            awaits completion in-request); work still runs on the single
            generation worker so videos/images never race on the mesh."""
            if not request.get("prompt"):
                self._send(400, {"error": "prompt required"})
                return
            if edit:
                import base64
                import io

                b64 = request.get("image")
                if not b64:
                    self._send(400, {"error": "image required for edits"})
                    return
                import PIL.Image

                request["_pil_image"] = PIL.Image.open(
                    io.BytesIO(base64.b64decode(b64))).convert("RGB")
            job = store.create(request, kind="image")
            if not worker.submit(job["id"]):
                store.update(job["id"], status="failed",
                             error="server at capacity")
                self._send(429, {"error": "server at capacity, retry later"})
                return
            deadline = time.time() + float(request.get("timeout", 600))
            while time.time() < deadline:
                job = store.get(job["id"])
                if job["status"] in ("completed", "failed"):
                    break
                time.sleep(0.05)
            if job["status"] != "completed":
                self._send(500, {"error": job.get("error") or "timeout"})
                return
            resp_format = (request.get("response_format") or
                           "b64_json").lower()
            data: dict[str, Any]
            if resp_format == "url":
                data = {"url": f"/v1/images/{job['id']}/content",
                        "revised_prompt": request["prompt"]}
            else:
                import base64

                with open(job["video_path"], "rb") as fh:
                    data = {"b64_json":
                            base64.b64encode(fh.read()).decode(),
                            "revised_prompt": request["prompt"]}
            self._send(200, {
                "id": job["id"],
                "created": job["created_at"],
                "data": [data],
                "inference_time_s": job.get("generation_time"),
            })

        def do_POST(self) -> None:
            request = self._read_json()
            if request is None:
                return
            if self.path in ("/v1/images", "/v1/images/generations"):
                self._image_request(request, edit=False)
                return
            if self.path == "/v1/images/edits":
                self._image_request(request, edit=True)
                return
            if self.path not in ("/v1/videos", "/v1/videos/generations"):
                self._send(404, {"error": "not found"})
                return
            if not request.get("prompt"):
                self._send(400, {"error": "prompt required"})
                return
            job = store.create(request)
            if not worker.submit(job["id"]):
                store.update(job["id"], status="failed",
                             error="server at capacity")
                self._send(429, {"error": "server at capacity, retry later"})
                return
            self._send(200, store.public(job))

    return Handler


class VideoAPIServer:
    def __init__(self, generator, model_id: str = "fastvideo-tpu",
                 host: str = "0.0.0.0", port: int = 8000,
                 max_queue_depth: int | None = None):
        self.store = VideoStore()
        self.worker = GenerationWorker(generator, self.store,
                                       max_queue_depth=max_queue_depth)
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
        try:
            self.worker.q.put_nowait(None)
        except queue.Full:  # worker is daemon; it dies with the process
            pass


def run_server(model_path: str, host: str = "0.0.0.0", port: int = 8000,
               num_gpus: int = 1, **kwargs) -> None:
    from fastvideo_tpu import VideoGenerator

    generator = VideoGenerator.from_pretrained(model_path,
                                               num_gpus=num_gpus, **kwargs)
    server = VideoAPIServer(generator, model_id=model_path, host=host,
                            port=port)
    server.serve_forever()
