"""Multi-replica streaming router: WS load balancer + health registry.

Behavioral reference: /root/reference/fastvideo/entrypoints/streaming/
router/{registry.py, main.py, config.py} and entrypoints/cli/
router_serve.py — a separate process that proxies client WebSocket
sessions onto healthy backend replicas. Health per replica follows the
reference's state machine: HEALTHY --(N consecutive failures)-->
UNHEALTHY --(M consecutive successes)--> HEALTHY.

Zero-FastAPI port: the proxy and probes run on ``websockets`` + asyncio
(the same stack as the streaming server).
"""

from __future__ import annotations

import asyncio
import contextlib
import dataclasses
import enum
import itertools
import json
import time

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class ReplicaStatus(enum.Enum):
    UNKNOWN = "unknown"
    HEALTHY = "healthy"
    UNHEALTHY = "unhealthy"


@dataclasses.dataclass
class ReplicaEndpoint:
    url: str  # ws://host:port
    primary: bool = False


@dataclasses.dataclass
class RouterConfig:
    replicas: list[ReplicaEndpoint]
    host: str = "0.0.0.0"
    port: int = 8700
    health_interval: float = 5.0
    failure_threshold: int = 3
    recovery_threshold: int = 2
    probe_timeout: float = 3.0

    @classmethod
    def from_file(cls, path: str) -> "RouterConfig":
        """YAML/JSON with a top-level ``router:`` block (reference
        router_serve.py:72-113)."""
        with open(path) as fh:
            text = fh.read()
        try:
            raw = json.loads(text)
        except json.JSONDecodeError:
            import yaml

            raw = yaml.safe_load(text)
        router = raw.get("router") if isinstance(raw, dict) else None
        if not isinstance(router, dict):
            raise ValueError(
                f"Router config {path!r} needs a top-level `router:` block")
        reps = []
        for i, r in enumerate(router.get("replicas", [])):
            if not isinstance(r, dict) or "url" not in r:
                raise ValueError(f"router.replicas[{i}] needs a 'url'")
            reps.append(ReplicaEndpoint(url=r["url"],
                                        primary=bool(r.get("primary"))))
        if not reps:
            raise ValueError("router config must list at least one replica")
        hc = router.get("health_check") or {}
        return cls(replicas=reps,
                   host=router.get("host", "0.0.0.0"),
                   port=int(router.get("port", 8700)),
                   health_interval=float(hc.get("interval", 5.0)),
                   failure_threshold=int(hc.get("failure_threshold", 3)),
                   recovery_threshold=int(hc.get("recovery_threshold", 2)),
                   probe_timeout=float(hc.get("timeout", 3.0)))


@dataclasses.dataclass
class ReplicaHealth:
    status: ReplicaStatus = ReplicaStatus.UNKNOWN
    consecutive_failures: int = 0
    consecutive_successes: int = 0
    active_sessions: int = 0
    last_probe_s: float = 0.0


async def _ws_probe(url: str, timeout: float) -> bool:
    """Default probe: a WS connection that opens cleanly is healthy."""
    import websockets

    try:
        ws = await asyncio.wait_for(websockets.connect(url), timeout)
        await ws.close()
        return True
    except Exception:
        return False


class ReplicaRegistry:
    """Health tracking (reference router/registry.py state machine)."""

    def __init__(self, config: RouterConfig, probe=None):
        self.config = config
        self.probe = probe or _ws_probe
        self.health = {r.url: ReplicaHealth() for r in config.replicas}
        self._rr = itertools.count()

    async def probe_once(self) -> None:
        results = await asyncio.gather(*[
            self.probe(r.url, self.config.probe_timeout)
            for r in self.config.replicas
        ])
        for rep, ok in zip(self.config.replicas, results):
            h = self.health[rep.url]
            h.last_probe_s = time.time()
            if ok:
                h.consecutive_successes += 1
                h.consecutive_failures = 0
                if (h.status is not ReplicaStatus.HEALTHY and
                        (h.status is ReplicaStatus.UNKNOWN or
                         h.consecutive_successes >=
                         self.config.recovery_threshold)):
                    h.status = ReplicaStatus.HEALTHY
                    logger.info("replica %s -> HEALTHY", rep.url)
            else:
                h.consecutive_failures += 1
                h.consecutive_successes = 0
                if (h.status is not ReplicaStatus.UNHEALTHY and
                        (h.status is ReplicaStatus.UNKNOWN or
                         h.consecutive_failures >=
                         self.config.failure_threshold)):
                    h.status = ReplicaStatus.UNHEALTHY
                    logger.info("replica %s -> UNHEALTHY", rep.url)

    async def probe_loop(self) -> None:
        while True:
            await self.probe_once()
            await asyncio.sleep(self.config.health_interval)

    def pick(self) -> ReplicaEndpoint | None:
        """Least-loaded healthy replica; primaries win ties
        (reference router/main.py pick)."""
        healthy = [r for r in self.config.replicas
                   if self.health[r.url].status is ReplicaStatus.HEALTHY]
        if not healthy:
            return None
        # true round-robin tie-break: rotate the candidate order per pick
        # (a per-candidate counter inside one min() call always favored
        # list order, pinning ties to the first replica)
        offset = next(self._rr) % len(healthy)
        rotated = healthy[offset:] + healthy[:offset]
        return min(rotated,
                   key=lambda r: (self.health[r.url].active_sessions,
                                  not r.primary))

    def status(self) -> dict:
        return {
            r.url: {
                "status": self.health[r.url].status.value,
                "active_sessions": self.health[r.url].active_sessions,
                "primary": r.primary,
            }
            for r in self.config.replicas
        }


class StreamingRouter:
    def __init__(self, config: RouterConfig, probe=None):
        self.config = config
        self.registry = ReplicaRegistry(config, probe)
        self._server = None
        self.port = config.port

    async def _bridge(self, client_ws) -> None:
        """Proxy one client session onto a healthy backend (reference
        router/main.py:130-205 _bridge_session)."""
        import websockets

        backend = self.registry.pick()
        if backend is None:
            await client_ws.send(json.dumps(
                {"type": "error", "code": "no_backend",
                 "detail": "no healthy replicas"}))
            await client_ws.close()
            return
        h = self.registry.health[backend.url]
        h.active_sessions += 1
        try:
            backend_ws = await asyncio.wait_for(
                websockets.connect(backend.url), self.config.probe_timeout)
        except Exception as e:
            h.active_sessions -= 1
            h.consecutive_failures += 1
            await client_ws.send(json.dumps(
                {"type": "error", "code": "backend_connect_failed",
                 "detail": str(e)}))
            await client_ws.close()
            return

        async def pump(src, dst):
            try:
                async for msg in src:
                    await dst.send(msg)
            except Exception:
                pass
            finally:
                with contextlib.suppress(Exception):
                    await dst.close()

        try:
            await asyncio.gather(pump(client_ws, backend_ws),
                                 pump(backend_ws, client_ws))
        finally:
            h.active_sessions -= 1
            with contextlib.suppress(Exception):
                await backend_ws.close()

    async def start(self):
        import websockets

        await self.registry.probe_once()
        self._probe_task = asyncio.create_task(self.registry.probe_loop())
        self._server = await websockets.serve(self._bridge,
                                              self.config.host,
                                              self.config.port)
        self.port = self._server.sockets[0].getsockname()[1]
        logger.info("router listening on %s:%d (%d replicas)",
                    self.config.host, self.port,
                    len(self.config.replicas))
        return self

    async def stop(self) -> None:
        self._probe_task.cancel()
        with contextlib.suppress(asyncio.CancelledError):
            await self._probe_task
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()

    def run_forever(self) -> None:  # pragma: no cover - CLI entry
        async def _main():
            await self.start()
            await asyncio.Future()

        asyncio.run(_main())


def run_router(config_path: str) -> None:  # pragma: no cover - CLI entry
    StreamingRouter(RouterConfig.from_file(config_path)).run_forever()
