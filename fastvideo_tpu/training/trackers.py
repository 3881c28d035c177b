"""Experiment trackers.

Analog of /root/reference/fastvideo/training/trackers.py (:222-560):
BaseTracker interface (log / log_artifacts / timed / video / finish),
DummyTracker, SequentialTracker fan-out, and initialize_trackers().
The reference's cloud backends (wandb, swanlab) aren't installed in this
environment; the TPU-native default is a local JSONL tracker whose files
can be synced to any dashboard later. Backends register by name, so a
wandb backend is a drop-in when the package exists.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections.abc import Iterable
from enum import Enum
from typing import Any

import numpy as np

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class Timer:
    def __init__(self) -> None:
        self._start: float | None = None
        self._elapsed = 0.0

    def start(self) -> None:
        self._start = time.perf_counter()

    def end(self) -> None:
        if self._start is not None:
            self._elapsed = time.perf_counter() - self._start
            self._start = None

    @property
    def elapsed_time(self) -> float:
        return self._elapsed


class BaseTracker:
    """Interface: subclasses implement log/finish (and optionally others)."""

    def __init__(self) -> None:
        self.timers: dict[str, Timer] = {}

    @contextlib.contextmanager
    def timed(self, name: str, step: int | None = None,
              log: bool = True):
        timer = self.timers.setdefault(name, Timer())
        timer.start()
        try:
            yield timer
        finally:
            timer.end()
            if log and step is not None:
                self.log({name: timer.elapsed_time}, step)

    def log(self, metrics: dict[str, Any], step: int) -> None:
        raise NotImplementedError

    def log_artifacts(self, artifacts: dict[str, Any], step: int) -> None:
        self.log(artifacts, step)

    def log_file(self, file_path: str, name: str | None = None,
                 step: int | None = None) -> None:
        pass

    def video(self, data: Any, caption: str | None = None,
              fps: int | float | None = None, format: str | None = None):
        return data

    def finish(self) -> None:
        raise NotImplementedError


class DummyTracker(BaseTracker):
    def log(self, metrics: dict[str, Any], step: int) -> None:
        pass

    def finish(self) -> None:
        pass


class JsonlTracker(BaseTracker):
    """Local file tracker: metrics to metrics.jsonl, config to config.json,
    videos to .npy artifacts. Zero-egress-friendly."""

    def __init__(self, project: str, config: dict[str, Any] | None = None,
                 log_dir: str = ".", run_name: str | None = None) -> None:
        super().__init__()
        run_name = run_name or f"run-{int(time.time())}"
        self.dir = os.path.join(log_dir, project, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self._fh = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        if config:
            clean = {k: v for k, v in config.items()
                     if isinstance(v, (int, float, str, bool, list, tuple,
                                       type(None)))}
            with open(os.path.join(self.dir, "config.json"), "w") as fh:
                json.dump(clean, fh, indent=2, default=str)

    def log(self, metrics: dict[str, Any], step: int) -> None:
        row = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, (int, float, str, bool, type(None))):
                row[k] = v
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()

    def log_file(self, file_path: str, name: str | None = None,
                 step: int | None = None) -> None:
        self.log({"file": file_path, "name": name or
                  os.path.basename(file_path)}, step or 0)

    def video(self, data: Any, caption: str | None = None,
              fps: int | float | None = None, format: str | None = None):
        arr = np.asarray(data)
        path = os.path.join(self.dir, f"video-{int(time.time()*1e3)}.npy")
        np.save(path, arr)
        return {"video": path, "caption": caption, "fps": fps}

    def finish(self) -> None:
        self._fh.close()


class WandbTracker(BaseTracker):
    """Thin wandb adapter; requires the wandb package at runtime."""

    def __init__(self, project: str, config: dict[str, Any] | None = None,
                 log_dir: str = ".", run_name: str | None = None) -> None:
        super().__init__()
        import wandb  # not installed here; gate at init

        self._wandb = wandb
        self.run = wandb.init(project=project, config=config, dir=log_dir,
                              name=run_name)

    def log(self, metrics: dict[str, Any], step: int) -> None:
        self.run.log(metrics, step=step)

    def video(self, data: Any, caption: str | None = None,
              fps: int | float | None = None, format: str | None = None):
        return self._wandb.Video(data, caption=caption, fps=fps or 16,
                                 format=format or "mp4")

    def finish(self) -> None:
        self.run.finish()


class SequentialTracker(BaseTracker):
    def __init__(self, trackers: Iterable[BaseTracker]) -> None:
        super().__init__()
        self.trackers = list(trackers)

    def log(self, metrics: dict[str, Any], step: int) -> None:
        for t in self.trackers:
            t.log(metrics, step)

    def log_artifacts(self, artifacts: dict[str, Any], step: int) -> None:
        for t in self.trackers:
            t.log_artifacts(artifacts, step)

    def log_file(self, file_path: str, name: str | None = None,
                 step: int | None = None) -> None:
        for t in self.trackers:
            t.log_file(file_path, name, step)

    def video(self, data, caption=None, fps=None, format=None):
        return [t.video(data, caption, fps, format) for t in self.trackers]

    def finish(self) -> None:
        for t in self.trackers:
            t.finish()


class Trackers(str, Enum):
    DUMMY = "dummy"
    JSONL = "jsonl"
    WANDB = "wandb"


_BACKENDS = {
    Trackers.DUMMY.value: lambda **kw: DummyTracker(),
    Trackers.JSONL.value: JsonlTracker,
    Trackers.WANDB.value: WandbTracker,
}

TrackerType = BaseTracker


def initialize_trackers(trackers: Iterable[str], project: str,
                        config: dict[str, Any] | None = None,
                        log_dir: str = ".",
                        run_name: str | None = None) -> BaseTracker:
    """Build the tracker stack; unknown/unavailable backends degrade to
    no-op with a warning (reference trackers.py:514-560)."""
    built: list[BaseTracker] = []
    for name in trackers:
        factory = _BACKENDS.get(str(name).lower())
        if factory is None:
            logger.warning("Unknown tracker %r; skipping", name)
            continue
        try:
            built.append(factory(project=project, config=config,
                                 log_dir=log_dir, run_name=run_name))
        except Exception as e:
            logger.warning("Tracker %r unavailable (%s); skipping", name, e)
    if not built:
        return DummyTracker()
    if len(built) == 1:
        return built[0]
    return SequentialTracker(built)
