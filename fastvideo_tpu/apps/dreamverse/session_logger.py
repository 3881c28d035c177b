"""Per-host session event log (JSONL).

Behavior analog of /root/reference/apps/dreamverse/dreamverse/
session_logger.py: one timestamped .jsonl file per server boot under
``root_dir/<hostname>/``, each line ``{ts, event, hostname, client_id,
**payload}``. Thread-safe (the TPU backend serves sessions from
threads, not a single asyncio loop).
"""

from __future__ import annotations

import datetime
import json
import socket
import threading
from pathlib import Path
from typing import Any


def _utc_now_iso() -> str:
    return datetime.datetime.now(datetime.timezone.utc).isoformat()


class SessionEventLogger:
    def __init__(self, root_dir: str | Path):
        self.hostname = socket.gethostname()
        stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%y%m%d_%H%M%S_%f")
        self.directory = Path(root_dir) / self.hostname
        self.path = self.directory / f"{stamp}.jsonl"
        self._lock = threading.Lock()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.path.touch(exist_ok=False)

    def write_event(self, *, event: str, client_id: str,
                    payload: dict[str, Any] | None = None) -> None:
        entry: dict[str, Any] = {
            "ts": _utc_now_iso(),
            "event": event,
            "hostname": self.hostname,
            "client_id": client_id,
        }
        if payload:
            entry.update(payload)
        with self._lock, self.path.open("a", encoding="utf-8") as fp:
            fp.write(json.dumps(entry, ensure_ascii=False) + "\n")

    def read_events(self) -> list[dict[str, Any]]:
        with self._lock:
            return [json.loads(line)
                    for line in self.path.read_text().splitlines() if line]
