"""Dreamverse WebSocket server.

Behavior analog of /root/reference/apps/dreamverse/dreamverse/main.py
(websocket endpoint) + mock_server.py: binds a
:class:`SessionController` per connection over the device pool and
streams media events back as JSON headers + binary chunks.

Protocol (JSON text frames unless noted):
  -> {"type": "join"}
  <- {"type": "joined", "user_id": str, "slot_id": int}
  -> {"type": "prompt", "prompt": str}
  <- {"type": "prompt_ready", "prompt": str, "source": str}
  -> {"type": "advance"}          # generate the next segment
  <- {"type": "media_init", "segment_idx": int, "stream_id": str}
  <- {"type": "media_chunk", "segment_idx": int, "bytes": N}
  <- <binary chunk payload>
  <- {"type": "media_complete", "segment_idx": int, "chunks": N}
  -> {"type": "snapshot"} / {"type": "leave"}
Errors: {"type": "error", "detail": str}

``worker="mock"`` serves the echo worker (the reference's mock_server
mode); ``worker="streaming"`` builds workers over
StreamingVideoGenerator.from_pretrained(model_path).
"""

from __future__ import annotations

import asyncio
import json
import queue

from fastvideo_tpu.apps.dreamverse.config import DreamverseConfig
from fastvideo_tpu.apps.dreamverse.messages import (MediaChunk,
                                                    MediaComplete,
                                                    MediaInit)
from fastvideo_tpu.apps.dreamverse.pool import DevicePool
from fastvideo_tpu.apps.dreamverse.session import (SessionController,
                                                   SessionError)
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class StreamingGeneratorWorker:
    """Real worker: one StreamingVideoGenerator stepped per segment."""

    def __init__(self, model_path: str):
        from fastvideo_tpu.entrypoints.streaming_generator import (
            StreamingVideoGenerator)

        self.gen = StreamingVideoGenerator.from_pretrained(model_path)

    def reset(self, **kwargs) -> None:
        self._started = False

    def step(self, prompt: str, **kwargs):
        if not getattr(self, "_started", False):
            self.gen.reset(prompt=prompt, **kwargs)
            self._started = True
        frames = self.gen.step()
        import numpy as np

        return np.asarray(frames, np.uint8).tobytes()


def build_pool(config: DreamverseConfig, worker: str = "mock",
               num_slots: int = 1) -> DevicePool:
    if worker == "mock":
        return DevicePool(num_slots=num_slots)
    if worker == "streaming":
        path = config.model_path
        return DevicePool(
            num_slots=num_slots,
            worker_factory=lambda: StreamingGeneratorWorker(path))
    raise ValueError(f"unknown worker kind {worker!r}")


class DreamverseServer:
    def __init__(self, config: DreamverseConfig | None = None,
                 pool: DevicePool | None = None,
                 host: str = "0.0.0.0", port: int = 8766,
                 worker: str = "mock"):
        self.config = config or DreamverseConfig.from_env()
        self.pool = pool or build_pool(self.config, worker)
        self.host = host
        self.port = port
        self._server = None

    async def _wait_segment(self, ws, session: SessionController,
                            timeout: float = 60.0) -> None:
        """Block (async) until the segment's MediaComplete is relayed."""
        loop = asyncio.get_running_loop()
        deadline = loop.time() + timeout
        while loop.time() < deadline:
            try:
                event = await asyncio.wait_for(
                    loop.run_in_executor(None, session.events.get, True,
                                         0.25),
                    timeout=1.0)
            except (asyncio.TimeoutError, queue.Empty):
                continue
            if isinstance(event, MediaInit):
                await ws.send(json.dumps({
                    "type": "media_init", "segment_idx": event.segment_idx,
                    "stream_id": event.stream_id, "mime": event.mime}))
            elif isinstance(event, MediaChunk):
                await ws.send(json.dumps({
                    "type": "media_chunk",
                    "segment_idx": event.segment_idx,
                    "bytes": len(event.chunk)}))
                await ws.send(event.chunk)
            elif isinstance(event, MediaComplete):
                await ws.send(json.dumps({
                    "type": "media_complete",
                    "segment_idx": event.segment_idx,
                    "chunks": event.chunks}))
                return
            else:
                await ws.send(json.dumps({"type": "error",
                                          "detail": str(event)}))
                return

    async def _handler(self, ws) -> None:
        session: SessionController | None = None
        try:
            async for message in ws:
                if isinstance(message, (bytes, bytearray)):
                    continue
                try:
                    msg = json.loads(message)
                except json.JSONDecodeError:
                    await ws.send(json.dumps({"type": "error",
                                              "detail": "bad json"}))
                    continue
                mtype = msg.get("type")
                try:
                    if mtype == "join":
                        # Re-join on the same socket releases the previous
                        # session first — otherwise its pool slot and
                        # stream queue leak until restart.
                        if session is not None:
                            await asyncio.to_thread(session.close)
                            session = None
                        # Pool acquire + model reset block; keep the event
                        # loop free for other connections' media relays.
                        session = await asyncio.to_thread(
                            SessionController, self.pool, self.config)
                        await ws.send(json.dumps({
                            "type": "joined", "user_id": session.user_id,
                            "slot_id": session.slot.slot_id}))
                    elif session is None:
                        await ws.send(json.dumps({
                            "type": "error", "detail": "join first"}))
                    elif mtype == "prompt":
                        # Safety classifier + staged enhancer (possibly an
                        # on-box LM decode) run for seconds — off-loop.
                        ready = await asyncio.to_thread(
                            session.submit_prompt, msg.get("prompt", ""))
                        await ws.send(json.dumps({
                            "type": "prompt_ready", "prompt": ready.prompt,
                            "source": ready.source}))
                    elif mtype == "advance":
                        ready = await asyncio.to_thread(
                            session.advance,
                            wait_ms=int(msg.get("wait_ms", 10)))
                        await self._wait_segment(ws, session)
                    elif mtype == "snapshot":
                        await ws.send(json.dumps({
                            "type": "snapshot", **session.snapshot()}))
                    elif mtype == "leave":
                        await asyncio.to_thread(session.close)
                        session = None
                        await ws.send(json.dumps({"type": "left"}))
                    else:
                        await ws.send(json.dumps({
                            "type": "error",
                            "detail": f"unknown type {mtype!r}"}))
                except SessionError as exc:
                    await ws.send(json.dumps({"type": "error",
                                              "detail": str(exc)}))
        finally:
            if session is not None:
                await asyncio.to_thread(session.close)

    @staticmethod
    def _process_request(connection, request):
        """Serve the single-file web client on plain HTTP GETs (reference
        analog: the Dreamverse web app, apps/dreamverse/) while WebSocket
        upgrades fall through to the session handler."""
        try:
            upgrade = request.headers.get("Upgrade", "")
        except Exception:  # pragma: no cover - header API drift
            return None
        if upgrade.lower() == "websocket":
            return None
        from http import HTTPStatus

        from fastvideo_tpu.apps.dreamverse.ui import CLIENT_HTML

        if request.path in ("/", "/index.html"):
            resp = connection.respond(HTTPStatus.OK, CLIENT_HTML)
            # websockets Headers is a multidict: delete before set, or the
            # text/plain default from respond() stays first
            del resp.headers["Content-Type"]
            resp.headers["Content-Type"] = "text/html; charset=utf-8"
            return resp
        if request.path == "/health":
            return connection.respond(HTTPStatus.OK, "ok\n")
        return connection.respond(HTTPStatus.NOT_FOUND, "not found\n")

    async def start(self):
        import websockets

        self._server = await websockets.serve(
            self._handler, self.host, self.port,
            process_request=self._process_request)
        if self.port == 0:
            self.port = next(iter(self._server.sockets)).getsockname()[1]
        return self._server

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
        self.pool.shutdown()

    def run_forever(self) -> None:  # pragma: no cover - manual entrypoint
        async def main():
            await self.start()
            logger.info("dreamverse serving on ws://%s:%d", self.host,
                        self.port)
            await asyncio.Future()

        asyncio.run(main())


def main() -> None:  # pragma: no cover - manual entrypoint
    import argparse

    p = argparse.ArgumentParser("fastvideo dreamverse")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8766)
    p.add_argument("--worker", default="mock",
                   choices=["mock", "streaming"])
    p.add_argument("--slots", type=int, default=1)
    ns = p.parse_args()
    cfg = DreamverseConfig.from_env()
    server = DreamverseServer(cfg, build_pool(cfg, ns.worker, ns.slots),
                              host=ns.host, port=ns.port)
    server.run_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
