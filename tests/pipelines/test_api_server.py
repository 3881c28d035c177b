"""OpenAI-compatible server: submit job, poll to completion."""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


def _req(port, path, payload=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def test_api_server_generate(tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator
    from fastvideo_tpu.entrypoints.openai.api_server import VideoAPIServer

    par.destroy_mesh()
    ckpt = make_tiny_wan_checkpoint(str(tmp_path / "Wan-tiny"))
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    server = VideoAPIServer(gen, host="127.0.0.1", port=0)
    server.serve_background()
    try:
        assert _req(server.port, "/health")["status"] == "ok"
        models = _req(server.port, "/v1/models")
        assert models["data"][0]["object"] == "model"

        job = _req(server.port, "/v1/videos", {
            "prompt": "w1 w2", "height": 16, "width": 16, "num_frames": 3,
            "steps": 1, "guidance_scale": 1.0, "seed": 5,
            "output_path": str(tmp_path / "out"),
        })
        assert job["status"] in ("queued", "in_progress")
        for _ in range(120):
            job = _req(server.port, f"/v1/videos/{job['id']}")
            if job["status"] in ("completed", "failed"):
                break
            time.sleep(1)
        assert job["status"] == "completed", job
        assert job["video_path"]

        # typed api.GenerationRequest-shaped body (nested schema)
        job = _req(server.port, "/v1/videos", {
            "prompt": "w1 w2",
            "sampling": {"height": 16, "width": 16, "num_frames": 3,
                         "num_inference_steps": 1, "guidance_scale": 1.0,
                         "seed": 6},
            "output": {"output_path": str(tmp_path / "out2")},
        })
        for _ in range(120):
            job = _req(server.port, f"/v1/videos/{job['id']}")
            if job["status"] in ("completed", "failed"):
                break
            time.sleep(1)
        assert job["status"] == "completed", job
        assert job["video_path"]

        # /v1/images: synchronous single-frame generation -> b64 PNG
        img = _req(server.port, "/v1/images", {
            "prompt": "w1 w2", "size": "16x16",
            "num_inference_steps": 1, "guidance_scale": 1.0, "seed": 9,
            "output_path": str(tmp_path / "img"),
        })
        assert img["data"][0]["b64_json"], img
        import base64
        png = base64.b64decode(img["data"][0]["b64_json"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # url response_format + content fetch
        img2 = _req(server.port, "/v1/images", {
            "prompt": "w1 w2", "size": "16x16", "response_format": "url",
            "num_inference_steps": 1, "guidance_scale": 1.0, "seed": 9,
            "output_path": str(tmp_path / "img"),
        })
        url = img2["data"][0]["url"]
        raw = urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}{url}", timeout=30).read()
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        server.shutdown()


def test_api_server_queue_bound():
    """A POST burst past max_queue_depth gets 429, not unbounded queueing."""
    import threading
    import urllib.error

    from fastvideo_tpu.entrypoints.openai.api_server import VideoAPIServer

    release = threading.Event()

    class BlockingGenerator:
        def generate_video(self, **kwargs):
            release.wait(timeout=30)
            return {"video_path": "/dev/null", "generation_time": 0.0}

    server = VideoAPIServer(BlockingGenerator(), host="127.0.0.1", port=0,
                            max_queue_depth=1)
    server.serve_background()
    try:
        body = {"prompt": "p", "height": 16, "width": 16, "num_frames": 1,
                "steps": 1}
        # worker picks up #1 and blocks; #2 sits in the queue; #3 must 429
        _req(server.port, "/v1/videos", body)
        time.sleep(0.3)  # let the worker dequeue #1
        _req(server.port, "/v1/videos", body)
        codes = []
        for _ in range(3):
            try:
                _req(server.port, "/v1/videos", body)
                codes.append(200)
            except urllib.error.HTTPError as e:
                codes.append(e.code)
        assert 429 in codes, codes
        release.set()
    finally:
        release.set()
        server.shutdown()
