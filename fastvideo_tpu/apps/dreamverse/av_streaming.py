"""AV segment streaming: frames (+audio) -> chunked media events.

Behavior analog of /root/reference/apps/dreamverse/dreamverse/
av_streaming.py (:47-430) and config.py's STREAM_MODE: two encoders
publish the same StreamInit/StreamChunk/StreamComplete event protocol —

- ``legacy_jpeg``: per-frame JPEG payloads (PIL; always available).
- ``av_fmp4``: ffmpeg muxes RGB24 frames (+int16 PCM audio) into
  fragmented MP4, each fragment published as it leaves the encoder.
  Gated on an ffmpeg binary (``FFMPEG_BIN``/$PATH) — this container
  ships none, so the mode degrades with a clear error and callers fall
  back to ``legacy_jpeg`` (the reference's own fallback mode).

Both support head-trim of conditioning-overlap frames.
"""

from __future__ import annotations

import dataclasses
import io
import os
import shutil
import subprocess
import threading
import uuid
from typing import Callable, Union

import numpy as np

TARGET_FPS = 16
JPEG_QUALITY = 90

FFMPEG_BIN = os.getenv("FFMPEG_BIN") or shutil.which("ffmpeg")


@dataclasses.dataclass
class StreamInit:
    stream_id: str
    mime: str


@dataclasses.dataclass
class StreamChunk:
    stream_id: str
    chunk: bytes


@dataclasses.dataclass
class StreamComplete:
    stream_id: str
    chunks: int


StreamEvent = Union[StreamInit, StreamChunk, StreamComplete]


def generate_stream_id(segment_idx: int) -> str:
    return f"seg{segment_idx}-{uuid.uuid4().hex[:8]}"


def normalize_audio(audio, sample_rate: int | None
                    ) -> tuple[np.ndarray, int] | None:
    """float [-1,1] 1D/2D -> (int16 [N, C], channels)
    (reference _normalize_audio_tensor :81-103)."""
    if audio is None:
        return None
    arr = np.asarray(audio, np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    elif arr.ndim == 2 and arr.shape[0] <= 8 and arr.shape[0] < arr.shape[1]:
        arr = arr.T  # [C, N] -> [N, C]
    elif arr.ndim != 2:
        return None
    pcm = np.clip(arr, -1.0, 1.0)
    return (pcm * 32767.0).astype(np.int16), arr.shape[1]


def stream_jpeg(*, frames: list[np.ndarray] | np.ndarray, stream_id: str,
                publish: Callable[[StreamEvent], None],
                head_trim_frames: int = 0,
                quality: int = JPEG_QUALITY) -> tuple[bool, str | None]:
    """legacy_jpeg mode: one JPEG chunk per frame."""
    import PIL.Image

    frames = list(frames)
    if not frames:
        return False, "no frames returned"
    if head_trim_frames >= len(frames):
        return False, (f"head_trim_frames={head_trim_frames} removes all "
                       f"{len(frames)} frames in segment")
    frames = frames[head_trim_frames:]
    publish(StreamInit(stream_id=stream_id, mime="image/jpeg"))
    n = 0
    for frame in frames:
        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            frame = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
        buf = io.BytesIO()
        PIL.Image.fromarray(frame).save(buf, "JPEG", quality=quality)
        publish(StreamChunk(stream_id=stream_id, chunk=buf.getvalue()))
        n += 1
    publish(StreamComplete(stream_id=stream_id, chunks=n))
    return True, None


def stream_fmp4(*, frames: list[np.ndarray] | np.ndarray, stream_id: str,
                publish: Callable[[StreamEvent], None],
                audio=None, audio_sample_rate: int | None = None,
                head_trim_frames: int = 0,
                fps: int = TARGET_FPS,
                chunk_bytes: int = 64 * 1024) -> tuple[bool, str | None]:
    """av_fmp4 mode: ffmpeg -> fragmented MP4 chunks
    (reference stream_fmp4 :128-430; libx264 + optional PCM audio,
    movflags frag_keyframe+empty_moov+default_base_moof)."""
    frames = list(frames)
    if not frames:
        return False, "no frames returned"
    if FFMPEG_BIN is None:
        return False, "ffmpeg not found"
    if head_trim_frames >= len(frames):
        return False, (f"head_trim_frames={head_trim_frames} removes all "
                       f"{len(frames)} frames in segment")
    frames = frames[head_trim_frames:]
    first = np.asarray(frames[0])
    h, w = first.shape[:2]

    cmd = [FFMPEG_BIN, "-hide_banner", "-loglevel", "error",
           "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}",
           "-r", str(fps), "-i", "pipe:0"]
    audio_norm = normalize_audio(audio, audio_sample_rate)
    audio_file = None
    if audio_norm is not None and audio_sample_rate:
        import tempfile
        import wave

        pcm, channels = audio_norm
        audio_file = tempfile.NamedTemporaryFile(suffix=".wav",
                                                 delete=False)
        with wave.open(audio_file, "wb") as wf:
            wf.setnchannels(channels)
            wf.setsampwidth(2)
            wf.setframerate(int(audio_sample_rate))
            wf.writeframes(pcm.tobytes())
        cmd += ["-i", audio_file.name, "-c:a", "aac", "-shortest"]
    cmd += ["-c:v", "libx264", "-preset", "veryfast", "-pix_fmt",
            "yuv420p", "-movflags",
            "frag_keyframe+empty_moov+default_base_moof", "-f", "mp4",
            "pipe:1"]

    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE)

    # Drain stderr concurrently: ffmpeg blocks once the (~64 KB) stderr
    # pipe fills, which would wedge stdout before EOF and deadlock the
    # reader loop below.
    stderr_buf: list[bytes] = []

    def _drain_stderr():
        try:
            stderr_buf.append(proc.stderr.read())
        except Exception:
            pass

    errt = threading.Thread(target=_drain_stderr, daemon=True)
    errt.start()

    def _write_frames():
        try:
            for frame in frames:
                frame = np.asarray(frame)
                if frame.dtype != np.uint8:
                    frame = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
                proc.stdin.write(frame.tobytes())
            proc.stdin.close()
        except BrokenPipeError:
            pass

    writer = threading.Thread(target=_write_frames, daemon=True)
    writer.start()
    publish(StreamInit(stream_id=stream_id, mime="video/mp4"))
    n = 0
    while True:
        chunk = proc.stdout.read(chunk_bytes)
        if not chunk:
            break
        publish(StreamChunk(stream_id=stream_id, chunk=chunk))
        n += 1
    writer.join(timeout=10)
    rc = proc.wait()
    errt.join(timeout=5)
    if audio_file is not None:
        os.unlink(audio_file.name)
    if rc != 0:
        err = b"".join(stderr_buf).decode(errors="replace")[:300]
        return False, f"ffmpeg exited {rc}: {err}"
    publish(StreamComplete(stream_id=stream_id, chunks=n))
    return True, None


def stream_segment(mode: str, **kwargs) -> tuple[bool, str | None]:
    """STREAM_MODE dispatch with the reference's jpeg fallback."""
    if mode == "av_fmp4":
        ok, err = stream_fmp4(**kwargs)
        if ok or FFMPEG_BIN is not None:
            return ok, err
        kwargs.pop("audio", None)
        kwargs.pop("audio_sample_rate", None)
        kwargs.pop("fps", None)
        kwargs.pop("chunk_bytes", None)
    elif mode != "legacy_jpeg":
        return False, f"unknown STREAM_MODE {mode!r}"
    kwargs.pop("audio", None)
    kwargs.pop("audio_sample_rate", None)
    kwargs.pop("fps", None)
    kwargs.pop("chunk_bytes", None)
    return stream_jpeg(**kwargs)
