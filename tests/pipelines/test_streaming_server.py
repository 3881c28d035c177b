"""WS streaming server: session protocol with a mock generator.

Mirrors the reference's mock streaming backend test strategy
(/root/reference/fastvideo/entrypoints/streaming/mock_server.py).
"""

import asyncio
import json

import numpy as np
import pytest


class MockGenerator:
    def __init__(self):
        self.resets = 0
        self.steps = 0

    def reset(self, prompt, output_path=None):
        self.resets += 1

    def step(self, keyboard=None, mouse=None):
        self.steps += 1
        return np.full((4, 8, 8, 3), self.steps, dtype=np.uint8)

    def finalize(self):
        return self.steps * 4




def test_streaming_ws_protocol():
    websockets = pytest.importorskip("websockets")

    from fastvideo_tpu.entrypoints.streaming.server import StreamingServer

    async def scenario():
        server = StreamingServer(MockGenerator(), host="127.0.0.1", port=0)
        await server.start()
        uri = f"ws://127.0.0.1:{server.port}"
        async with websockets.connect(uri) as ws:
            await ws.send(json.dumps({"type": "reset", "prompt": "hi"}))
            assert json.loads(await ws.recv())["type"] == "ready"

            await ws.send(json.dumps({"type": "step"}))
            header = json.loads(await ws.recv())
            assert header["type"] == "frames"
            payload = await ws.recv()
            arr = np.frombuffer(payload, dtype=header["dtype"]).reshape(
                header["shape"])
            assert arr.shape == (4, 8, 8, 3)
            assert (arr == 1).all()

            await ws.send(json.dumps({"type": "step"}))
            json.loads(await ws.recv())
            await ws.recv()

            await ws.send(json.dumps({"type": "finalize"}))
            done = json.loads(await ws.recv())
            assert done == {"type": "done", "total_frames": 8}

            # bad request path
            await ws.send(json.dumps({"type": "step"}))
            err = json.loads(await ws.recv())
            assert err["type"] == "error" and err["code"] == "BAD_REQUEST"
        await server.stop()

    asyncio.run(scenario())
