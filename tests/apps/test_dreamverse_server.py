"""Dreamverse WS server end-to-end over the mock worker."""

import asyncio
import json

import pytest


def test_ws_session_protocol():
    websockets = pytest.importorskip("websockets")

    from fastvideo_tpu.apps.dreamverse import DreamverseConfig
    from fastvideo_tpu.apps.dreamverse.server import DreamverseServer

    cfg = DreamverseConfig(generation_segment_cap=3,
                           prompt_auto_timeout_ms=50)

    async def run():
        server = DreamverseServer(cfg, host="127.0.0.1", port=0,
                                  worker="mock")
        await server.start()
        try:
            uri = f"ws://127.0.0.1:{server.port}"
            async with websockets.connect(uri) as ws:
                # must join first
                await ws.send(json.dumps({"type": "prompt",
                                          "prompt": "x"}))
                err = json.loads(await ws.recv())
                assert err["type"] == "error"

                await ws.send(json.dumps({"type": "join"}))
                joined = json.loads(await ws.recv())
                assert joined["type"] == "joined"

                await ws.send(json.dumps({"type": "prompt",
                                          "prompt": "a blue fox"}))
                ready = json.loads(await ws.recv())
                assert ready["type"] == "prompt_ready"
                assert ready["prompt"] == "a blue fox"

                await ws.send(json.dumps({"type": "advance"}))
                init = json.loads(await ws.recv())
                assert init["type"] == "media_init"
                chunk_hdr = json.loads(await ws.recv())
                assert chunk_hdr["type"] == "media_chunk"
                payload = await ws.recv()
                assert payload == b"a blue fox"  # echo worker
                done = json.loads(await ws.recv())
                assert done["type"] == "media_complete"

                await ws.send(json.dumps({"type": "snapshot"}))
                snap = json.loads(await ws.recv())
                assert snap["segments_generated"] == 1

                # blocked prompt surfaces as error, session stays alive
                await ws.send(json.dumps({"type": "prompt",
                                          "prompt": "nsfw thing"}))
                blocked = json.loads(await ws.recv())
                assert blocked["type"] == "error"

                await ws.send(json.dumps({"type": "leave"}))
                left = json.loads(await ws.recv())
                assert left["type"] == "left"
        finally:
            await server.stop()

    asyncio.run(run())


def test_http_serves_web_client():
    """Plain HTTP GET / on the WS port returns the single-file web client
    (reference analog: the Dreamverse browser app)."""
    pytest.importorskip("websockets")
    import urllib.request

    from fastvideo_tpu.apps.dreamverse import DreamverseConfig
    from fastvideo_tpu.apps.dreamverse.server import DreamverseServer

    cfg = DreamverseConfig(generation_segment_cap=1,
                           prompt_auto_timeout_ms=50)

    async def run():
        server = DreamverseServer(cfg, host="127.0.0.1", port=0,
                                  worker="mock")
        await server.start()
        try:
            url = f"http://127.0.0.1:{server.port}/"

            def fetch():
                with urllib.request.urlopen(url, timeout=5) as r:
                    return r.headers["Content-Type"], r.read().decode()

            ctype, page = await asyncio.to_thread(fetch)
            assert ctype.startswith("text/html")
            assert "Dreamverse" in page and "media_chunk" in page

            def health():
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{server.port}/health",
                        timeout=5) as r:
                    return r.read().decode()

            assert "ok" in await asyncio.to_thread(health)
        finally:
            await server.stop()

    asyncio.run(run())
