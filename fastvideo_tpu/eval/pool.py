"""Threaded media prefetcher for the Evaluator.

Behavioral reference: /root/reference/fastvideo/eval/pool.py (:1-187):
loader threads decode path-backed samples into a bounded ready queue so
metric compute overlaps video decode; items carry their input index;
decode errors are forwarded to the consumer's stack instead of hanging
the queue; consumers poll with a timeout so surplus workers exit when the
sample list is exhausted.
"""

from __future__ import annotations

import queue
import threading
from typing import Any

from fastvideo_tpu.eval.types import Video

_SENTINEL = object()


class _DecodeError:
    __slots__ = ("exc",)

    def __init__(self, exc: BaseException) -> None:
        self.exc = exc


def load_media(source: str) -> Video:
    """Decode a media path into a populated Video handle.

    .wav → audio-only; anything imageio can read → frames [T,H,W,C]
    float32 in [0, 1] (+ fps when the container reports it).
    """
    import numpy as np

    v = Video(source=source)
    if source.lower().endswith(".npy"):
        # ffmpeg-free interchange format (shared with load_video_frames
        # and VideoGenerator's mp4-write fallback)
        arr = np.load(source).astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        if arr.ndim == 3:
            arr = arr[..., None]
        v.frames = arr
        return v
    if source.lower().endswith(".wav"):
        from scipy.io import wavfile

        sr, data = wavfile.read(source)
        data = np.asarray(data)
        if data.dtype.kind == "i":
            data = data.astype(np.float32) / float(
                np.iinfo(data.dtype).max)
        v.audio = data.astype(np.float32)
        v.audio_sr = int(sr)
        return v
    frames: list[np.ndarray] = []
    try:
        import imageio.v2 as imageio

        reader = imageio.get_reader(source)
        try:
            meta = reader.get_meta_data()
            v.fps = float(meta.get("fps")) if meta.get("fps") else None
            frames = [np.asarray(f) for f in reader]
        finally:
            reader.close()
    except Exception:
        # no imageio backend for this container (e.g. mp4 without the
        # ffmpeg plugin) — fall back to OpenCV
        import cv2

        cap = cv2.VideoCapture(source)
        if not cap.isOpened():
            raise FileNotFoundError(f"cannot decode {source}") from None
        fps = cap.get(cv2.CAP_PROP_FPS)
        v.fps = float(fps) if fps and fps > 0 else None
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {source}")
    arr = np.stack(frames).astype(np.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    if arr.ndim == 3:
        arr = arr[..., None]
    v.frames = arr
    return v


class MediaPool:
    """Bounded prefetch queue: ``with MediaPool(samples) as pool:
    while (item := pool.get()) is not None: idx, decoded = item``."""

    def __init__(self, samples: list[dict], *, loader_threads: int = 1,
                 max_size: int = 4, decode_frames: bool = True) -> None:
        if loader_threads < 1:
            raise ValueError("loader_threads must be >= 1")
        self._decode_frames = decode_frames
        self._samples = samples
        self._n_loaders = loader_threads
        self._task_q: queue.Queue = queue.Queue()
        self._ready_q: queue.Queue = queue.Queue(maxsize=max(max_size, 1))
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        self._consumed = 0
        self._lock = threading.Lock()

    def __enter__(self) -> "MediaPool":
        for idx, sample in enumerate(self._samples):
            self._task_q.put((idx, sample))
        for _ in range(self._n_loaders):
            self._task_q.put(_SENTINEL)
        for _ in range(self._n_loaders):
            t = threading.Thread(target=self._loader_loop, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def __exit__(self, *exc: Any) -> None:
        self._stop.set()
        while True:  # unblock loaders stuck on a full ready queue
            try:
                self._ready_q.get_nowait()
            except queue.Empty:
                break
        for t in self._threads:
            t.join(timeout=5.0)

    def get(self) -> tuple[int, dict] | None:
        """Next decoded (idx, sample); None when all inputs consumed.
        Re-raises loader exceptions on the consumer's stack. The 0.1s
        poll lets surplus consumers notice exhaustion and exit."""
        while True:
            with self._lock:
                if self._consumed >= len(self._samples):
                    return None
            try:
                item = self._ready_q.get(timeout=0.1)
            except queue.Empty:
                continue
            with self._lock:
                self._consumed += 1
            idx, payload = item
            if isinstance(payload, _DecodeError):
                raise payload.exc
            return idx, payload

    def _loader_loop(self) -> None:
        while not self._stop.is_set():
            item = self._task_q.get()
            if item is _SENTINEL:
                return
            idx, sample = item
            try:
                decoded = (self._decode(sample) if self._decode_frames
                           else dict(sample))
            except BaseException as exc:  # forwarded to consumer
                self._ready_q.put((idx, _DecodeError(exc)))
                continue
            self._ready_q.put((idx, decoded))

    @staticmethod
    def _decode(sample: dict) -> dict:
        """Materialise Video handles with a source but no frames/audio.
        Everything else passes through untouched."""
        out = dict(sample)
        for key, val in sample.items():
            if (isinstance(val, Video) and val.source is not None
                    and val.frames is None and val.audio is None):
                loaded = load_media(val.source)
                val.frames = loaded.frames
                val.audio = loaded.audio
                val.audio_sr = loaded.audio_sr
                val.fps = val.fps or loaded.fps
                out[key] = val
        return out
