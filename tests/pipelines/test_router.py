"""Streaming router: health registry state machine + real WS proxying
with failover (reference entrypoints/streaming/router/)."""

import asyncio
import contextlib
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from fastvideo_tpu.entrypoints.streaming.router import (  # noqa: E402
    ReplicaEndpoint, ReplicaRegistry, ReplicaStatus, RouterConfig,
    StreamingRouter)


async def _echo_backend(tag: str):
    import websockets

    async def handler(ws):
        async for msg in ws:
            data = json.loads(msg)
            data["backend"] = tag
            await ws.send(json.dumps(data))

    server = await websockets.serve(handler, "127.0.0.1", 0)
    port = server.sockets[0].getsockname()[1]
    return server, f"ws://127.0.0.1:{port}"


def test_registry_state_machine():
    cfg = RouterConfig(replicas=[ReplicaEndpoint(url="ws://x")],
                       failure_threshold=2, recovery_threshold=2)
    flags = {"ok": True}

    async def probe(url, timeout):
        return flags["ok"]

    reg = ReplicaRegistry(cfg, probe)

    async def run():
        await reg.probe_once()
        assert reg.health["ws://x"].status is ReplicaStatus.HEALTHY
        flags["ok"] = False
        await reg.probe_once()  # 1 failure: still healthy (threshold 2)
        assert reg.health["ws://x"].status is ReplicaStatus.HEALTHY
        await reg.probe_once()
        assert reg.health["ws://x"].status is ReplicaStatus.UNHEALTHY
        flags["ok"] = True
        await reg.probe_once()
        assert reg.health["ws://x"].status is ReplicaStatus.UNHEALTHY
        await reg.probe_once()  # 2 successes: recovered
        assert reg.health["ws://x"].status is ReplicaStatus.HEALTHY

    asyncio.run(run())


def test_router_proxy_and_failover():
    import websockets

    async def run():
        s1, url1 = await _echo_backend("one")
        s2, url2 = await _echo_backend("two")
        cfg = RouterConfig(
            replicas=[ReplicaEndpoint(url=url1, primary=True),
                      ReplicaEndpoint(url=url2)],
            host="127.0.0.1", port=0, health_interval=0.2,
            failure_threshold=1, recovery_threshold=1, probe_timeout=2.0)
        router = StreamingRouter(cfg)
        await router.start()
        try:
            async def session():
                ws = await websockets.connect(
                    f"ws://127.0.0.1:{router.port}")
                await ws.send(json.dumps({"type": "ping"}))
                reply = json.loads(await asyncio.wait_for(ws.recv(), 5))
                await ws.close()
                return reply["backend"]

            # primary wins the tie at zero load
            assert await session() == "one"

            # kill the primary; after probes mark it UNHEALTHY, sessions
            # must route to the surviving replica
            s1.close()
            await s1.wait_closed()
            for _ in range(50):
                await router.registry.probe_once()
                if (router.registry.health[url1].status
                        is ReplicaStatus.UNHEALTHY):
                    break
                await asyncio.sleep(0.1)
            assert await session() == "two"

            st = router.registry.status()
            assert st[url1]["status"] == "unhealthy"
            assert st[url2]["status"] == "healthy"
        finally:
            await router.stop()
            s2.close()
            await s2.wait_closed()
            with contextlib.suppress(Exception):
                s1.close()

    asyncio.run(run())


def test_router_config_from_file(tmp_path):
    p = tmp_path / "router.json"
    p.write_text(json.dumps({
        "router": {
            "port": 9100,
            "replicas": [{"url": "ws://a", "primary": True},
                         {"url": "ws://b"}],
            "health_check": {"interval": 1.5, "failure_threshold": 4},
        }
    }))
    cfg = RouterConfig.from_file(str(p))
    assert cfg.port == 9100
    assert cfg.replicas[0].primary and not cfg.replicas[1].primary
    assert cfg.health_interval == 1.5
    assert cfg.failure_threshold == 4
    with pytest.raises(ValueError, match="router"):
        bad = tmp_path / "bad.json"
        bad.write_text("{}")
        RouterConfig.from_file(str(bad))
