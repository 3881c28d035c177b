"""Prefetching, resumable dataloader.

Analog of the reference's torchdata ``StatefulDataLoader`` usage
(/root/reference/fastvideo/dataset/parquet_dataset_map_style.py:417-446):
a background thread decodes parquet rows and stacks batches AHEAD of the
training step, so the host input pipeline overlaps device compute — on TPU
a synchronous loader stalls every step by the full decode time, the classic
training-MFU killer. ``state_dict``/``load_state_dict`` resume mid-epoch by
(epoch, batch index) without replaying decodes.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class PrefetchingLoader:
    """Wraps a ``make_batch(indices) -> batch`` function + a batch sampler
    into a prefetching iterator.

    The sampler must be re-iterable and deterministic given its state
    (``DPSPBatchSampler``); resume skips sampler index-lists (cheap) rather
    than decoded batches (expensive).
    """

    def __init__(self, sampler, make_batch: Callable[[list[int]], Any],
                 prefetch: int = 2):
        self.sampler = sampler
        self.make_batch = make_batch
        self.prefetch = max(1, int(prefetch))
        self._batch_in_epoch = 0
        self._skip = 0
        self._thread: threading.Thread | None = None
        self._q: queue.Queue | None = None
        self._stop = threading.Event()

    # -- iteration -----------------------------------------------------------

    def _producer(self) -> None:
        try:
            while not self._stop.is_set():
                produced = 0
                epoch = getattr(self.sampler, "epoch", 0)
                for i, indices in enumerate(self.sampler):
                    if self._stop.is_set():
                        return
                    if i < self._skip:
                        continue  # resume fast-forward: no decode
                    batch = self.make_batch(indices)
                    # puts block when `prefetch` batches are waiting —
                    # bounded host memory
                    while not self._stop.is_set():
                        try:
                            self._q.put((epoch, i, batch), timeout=0.5)
                            produced += 1
                            break
                        except queue.Full:
                            continue
                if self._skip == 0 and produced == 0:
                    # empty sampler: avoid a busy spin
                    self._q.put(None)
                    return
                self._skip = 0
        except Exception as e:  # surface producer errors to the consumer
            self._q.put(e)

    def _ensure_thread(self) -> None:
        if self._thread is None or not self._thread.is_alive():
            self._q = queue.Queue(maxsize=self.prefetch)
            self._stop.clear()
            self._thread = threading.Thread(target=self._producer,
                                            daemon=True)
            self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        self._ensure_thread()
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        epoch, i, batch = item
        self._epoch = epoch
        self._batch_in_epoch = i + 1
        return batch

    def shutdown(self) -> None:
        self._stop.set()
        if self._q is not None:
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass

    # -- resume ---------------------------------------------------------------

    def state_dict(self) -> dict:
        """Consumer-side position: the epoch + index of the LAST batch the
        trainer actually received (in-flight prefetched batches are
        deliberately not counted — they replay on resume)."""
        state = {"batch_in_epoch": self._batch_in_epoch,
                 "epoch": getattr(self, "_epoch", 0)}
        if hasattr(self.sampler, "state_dict"):
            state["sampler"] = self.sampler.state_dict()
        return state

    def load_state_dict(self, state: dict) -> None:
        self.shutdown()
        self._thread = None
        if "sampler" in state and hasattr(self.sampler, "load_state_dict"):
            self.sampler.load_state_dict(state["sampler"])
        if hasattr(self.sampler, "epoch"):
            # resume inside the epoch the consumer last saw
            self.sampler.epoch = int(state.get("epoch", 0))
        self._skip = int(state.get("batch_in_epoch", 0))
        self._batch_in_epoch = self._skip
