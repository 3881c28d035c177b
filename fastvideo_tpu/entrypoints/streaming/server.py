"""WebSocket streaming session server for realtime/causal models.

Analog of /root/reference/fastvideo/entrypoints/streaming/server.py
(SessionManager state machine + GPU pool + typed WS errors). The TPU mesh
is a single serial resource, so the pool is a one-slot lock with an acquire
timeout; frames stream as length-prefixed raw RGB chunks after a JSON
header (the reference's fragmented-MP4 encoder can be layered on top).

Protocol (JSON text frames unless noted):
  -> {"type": "reset", "prompt": str, ...}
  <- {"type": "ready"}
  -> {"type": "step", "keyboard": [...], "mouse": [...]}   (inputs optional)
  <- {"type": "frames", "shape": [T, H, W, 3], "dtype": "uint8"}
  <- <binary frame payload>
  -> {"type": "finalize"}
  <- {"type": "done", "total_frames": N}
Errors: {"type": "error", "code": "BUSY"|"BAD_REQUEST"|"INTERNAL", ...}
"""

from __future__ import annotations

import asyncio
import json
import threading

import numpy as np

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class GeneratorPool:
    """One-slot acquire/release with timeout (reference gpu_pool.py)."""

    def __init__(self, generator, acquire_timeout: float = 5.0):
        self.generator = generator
        self.acquire_timeout = acquire_timeout
        self._lock = threading.Lock()

    def acquire(self):
        if not self._lock.acquire(timeout=self.acquire_timeout):
            return None
        return self.generator

    def release(self) -> None:
        self._lock.release()


class StreamingSession:
    """Per-connection state machine (reference session.py)."""

    def __init__(self, pool: GeneratorPool):
        self.pool = pool
        self.generator = None
        self.active = False

    async def handle(self, ws) -> None:
        try:
            async for message in ws:
                if isinstance(message, bytes):
                    await self._error(ws, "BAD_REQUEST",
                                      "binary input not expected")
                    continue
                try:
                    msg = json.loads(message)
                except json.JSONDecodeError:
                    await self._error(ws, "BAD_REQUEST", "invalid json")
                    continue
                mtype = msg.get("type")
                if mtype == "reset":
                    await self._reset(ws, msg)
                elif mtype == "step":
                    await self._step(ws, msg)
                elif mtype == "finalize":
                    await self._finalize(ws)
                else:
                    await self._error(ws, "BAD_REQUEST",
                                      f"unknown type {mtype!r}")
        finally:
            self._release()

    def _release(self) -> None:
        if self.active:
            self.pool.release()
            self.active = False
            self.generator = None

    async def _error(self, ws, code: str, detail: str) -> None:
        await ws.send(json.dumps({"type": "error", "code": code,
                                  "detail": detail}))

    async def _reset(self, ws, msg: dict) -> None:
        if not self.active:
            gen = await asyncio.to_thread(self.pool.acquire)
            if gen is None:
                await self._error(ws, "BUSY", "no generator available")
                return
            self.generator = gen
            self.active = True
        prompt = msg.get("prompt", "")
        await asyncio.to_thread(self.generator.reset, prompt)
        await ws.send(json.dumps({"type": "ready"}))

    async def _step(self, ws, msg: dict) -> None:
        if not self.active:
            await self._error(ws, "BAD_REQUEST", "reset first")
            return
        try:
            frames = await asyncio.to_thread(
                self.generator.step, msg.get("keyboard"), msg.get("mouse"))
        except Exception as e:  # pragma: no cover
            logger.exception("step failed")
            await self._error(ws, "INTERNAL", str(e))
            return
        frames = np.ascontiguousarray(frames)
        await ws.send(json.dumps({
            "type": "frames",
            "shape": list(frames.shape),
            "dtype": str(frames.dtype),
        }))
        await ws.send(frames.tobytes())

    async def _finalize(self, ws) -> None:
        total = 0
        if self.active and hasattr(self.generator, "finalize"):
            total = await asyncio.to_thread(self.generator.finalize)
        self._release()
        await ws.send(json.dumps({"type": "done", "total_frames": total}))


class StreamingServer:
    def __init__(self, generator, host: str = "0.0.0.0", port: int = 8765,
                 acquire_timeout: float = 5.0):
        self.pool = GeneratorPool(generator, acquire_timeout)
        self.host = host
        self.port = port
        self._server = None

    async def _handler(self, ws) -> None:
        await StreamingSession(self.pool).handle(ws)

    async def start(self):
        import websockets

        self._server = await websockets.serve(self._handler, self.host,
                                              self.port)
        self.port = self._server.sockets[0].getsockname()[1]
        logger.info("Streaming WS server on :%d", self.port)
        return self._server

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()

    def run_forever(self) -> None:
        async def main():
            await self.start()
            await asyncio.Future()

        asyncio.run(main())
