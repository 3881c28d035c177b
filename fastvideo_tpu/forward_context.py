"""Forward context: per-step state threaded to model internals.

Analog of /root/reference/fastvideo/forward_context.py:32-56 — a context var
carrying (current_timestep, attn_metadata, forward_batch) so attention
implementations can read per-step sparse-attention metadata without
threading kwargs through every module.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
from typing import Any

from fastvideo_tpu.attention.backends.abstract import AttentionMetadata

__all__ = [
    "ForwardContext", "get_forward_context", "set_forward_context",
    "AttentionMetadata"
]


@dataclasses.dataclass
class ForwardContext:
    current_timestep: int = 0
    attn_metadata: AttentionMetadata | None = None
    forward_batch: Any = None


_forward_context: contextvars.ContextVar[ForwardContext | None] = (
    contextvars.ContextVar("forward_context", default=None))


def get_forward_context() -> ForwardContext | None:
    return _forward_context.get()


@contextlib.contextmanager
def set_forward_context(current_timestep: int = 0,
                        attn_metadata: AttentionMetadata | None = None,
                        forward_batch: Any = None):
    ctx = ForwardContext(current_timestep, attn_metadata, forward_batch)
    token = _forward_context.set(ctx)
    try:
        yield ctx
    finally:
        _forward_context.reset(token)
