"""Typed queue/IPC payloads.

Reference: dreamverse/session/messages.py (prompt pipeline) and
dreamverse/worker_ipc.py (media events routed from the worker's AV
stream to the per-user client queue).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class PromptSubmission:
    """A raw user prompt entering the pipeline (messages.py:8-12)."""

    prompt_id: str
    raw_prompt: str
    created_at_s: float


@dataclass
class ReadyPrompt:
    """An enhanced prompt ready for generation (messages.py:15-22)."""

    prompt: str
    source: str                        # user | enhancer | auto | fallback
    prompt_id: str | None = None
    fallback_used: bool = False
    seed_prompt_index: int | None = None
    loop_iteration: int | None = None


@dataclass
class MediaInit:
    """Start of a media stream for one segment (worker_ipc.py)."""

    user_id: str
    segment_idx: int
    stream_id: str
    mime: str = "video/mp4"


@dataclass
class MediaChunk:
    user_id: str
    segment_idx: int
    stream_id: str
    chunk: bytes = b""


@dataclass
class MediaComplete:
    user_id: str
    segment_idx: int
    stream_id: str
    chunks: int = 0
