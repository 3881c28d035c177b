"""Per-connection session controller.

Behavior analog of /root/reference/apps/dreamverse/dreamverse/session/
controller.py: owns a device-pool lease, the prompt pipeline
(safety filter -> enhancer -> ready queue), auto-advance when the user
goes idle, the generation segment cap, and the session timeout. The
reference's 1880-line asyncio WS handler is decomposed here into an
explicit state machine driven by ``submit_prompt`` / ``advance`` /
``events`` — the WS layer (entrypoints/streaming) binds a transport to
these calls.
"""

from __future__ import annotations

import queue
import time
import uuid

from fastvideo_tpu.apps.dreamverse.config import DreamverseConfig
from fastvideo_tpu.apps.dreamverse.messages import (PromptSubmission,
                                                    ReadyPrompt)
from fastvideo_tpu.apps.dreamverse.pool import DevicePool
from fastvideo_tpu.apps.dreamverse.prompt_enhancer import PromptEnhancer
from fastvideo_tpu.apps.dreamverse.prompt_safety import PromptSafetyFilter
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class SessionError(Exception):
    pass


class SessionController:
    """One user session over the pool."""

    def __init__(self, pool: DevicePool,
                 config: DreamverseConfig | None = None,
                 enhancer: PromptEnhancer | None = None,
                 safety: PromptSafetyFilter | None = None,
                 user_id: str | None = None, event_logger=None):
        self.pool = pool
        self.config = config or DreamverseConfig()
        self.enhancer = enhancer or PromptEnhancer()
        self.safety = safety or PromptSafetyFilter()
        self.event_logger = event_logger
        self.user_id = user_id or f"user_{uuid.uuid4().hex[:8]}"
        self.created_at = time.time()
        self.segments_generated = 0
        self.last_prompt: str | None = None
        self._ready: queue.Queue[ReadyPrompt] = queue.Queue()
        self._last_activity = time.time()
        self._closed = False
        self.events = pool.register_stream_queue(self.user_id)
        self.slot = pool.acquire(self.user_id)
        if self.slot is None:
            pool.unregister_stream_queue(self.user_id)
            self._log("session_rejected", reason="no_capacity")
            raise SessionError("No capacity available — try again later")
        self._log("session_start", slot_id=self.slot.slot_id)

    def _log(self, event: str, **payload) -> None:
        if self.event_logger is not None:
            self.event_logger.write_event(event=event,
                                          client_id=self.user_id,
                                          payload=payload or None)

    # -- prompt pipeline -----------------------------------------------------

    def submit_prompt(self, raw_prompt: str) -> ReadyPrompt:
        """Safety-check, enhance, and queue a user prompt
        (reference controller.py prompt submission path)."""
        self._check_open()
        raw_prompt = (raw_prompt or "").strip()
        if not raw_prompt:
            raise SessionError("Empty prompt")
        error = self.safety.get_prompt_safety_error(raw_prompt)
        if error is not None:
            self._log("prompt_blocked")
            raise SessionError(error)
        sub = PromptSubmission(prompt_id=uuid.uuid4().hex[:8],
                               raw_prompt=raw_prompt,
                               created_at_s=time.time())
        result = self.enhancer.enhance(sub.raw_prompt)
        ready = ReadyPrompt(prompt=result.prompt,
                            source="fallback" if result.fallback_used
                            else "enhancer",
                            prompt_id=sub.prompt_id,
                            fallback_used=result.fallback_used)
        self._ready.put(ready)
        self._last_activity = time.time()
        self._log("prompt_ready", source=ready.source)
        return ready

    def _auto_prompt(self) -> ReadyPrompt:
        """Idle continuation: repeat the last prompt
        (reference auto-advance path with PROMPT_AUTO_TIMEOUT_MS)."""
        prompt = self.last_prompt or "the scene continues"
        return ReadyPrompt(prompt=prompt, source="auto")

    def next_prompt(self, wait_ms: int | None = None) -> ReadyPrompt:
        """Next queued prompt, or the auto-continuation after the
        auto-timeout elapses with an empty queue."""
        timeout = (wait_ms if wait_ms is not None
                   else self.config.prompt_auto_timeout_ms) / 1000.0
        try:
            ready = self._ready.get(timeout=timeout)
            self.last_prompt = ready.prompt
            return ready
        except queue.Empty:
            return self._auto_prompt()

    # -- generation ----------------------------------------------------------

    def advance(self, wait_ms: int | None = None) -> ReadyPrompt:
        """Generate the next segment (queued or auto prompt)."""
        self._check_open()
        if self.segments_generated >= self.config.generation_segment_cap:
            raise SessionError(
                f"Session reached its segment cap "
                f"({self.config.generation_segment_cap})")
        if self.expired:
            raise SessionError("Session timed out")
        ready = self.next_prompt(wait_ms)
        self.last_prompt = ready.prompt
        self.pool.submit_step(
            self.user_id, ready.prompt,
            height=self.config.frame_height,
            width=self.config.frame_width,
            num_frames=self.config.num_frames,
            num_inference_steps=self.config.num_inference_steps)
        self.segments_generated += 1
        self._last_activity = time.time()
        self._log("segment_advance", segment=self.segments_generated,
                  source=ready.source)
        return ready

    # -- lifecycle -----------------------------------------------------------

    @property
    def expired(self) -> bool:
        return (time.time() - self._last_activity >
                self.config.session_timeout_s)

    def _check_open(self) -> None:
        if self._closed:
            raise SessionError("Session is closed")

    def snapshot(self) -> dict:
        """Reference queue_snapshot (:1151-1161)."""
        return {
            "user_id": self.user_id,
            "slot_id": self.slot.slot_id if self.slot else None,
            "segments_generated": self.segments_generated,
            "segment_cap": self.config.generation_segment_cap,
            "queued_prompts": self._ready.qsize(),
            "closed": self._closed,
        }

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self._log("session_end", segments=self.segments_generated)
        self.pool.release(self.user_id)
        self.pool.unregister_stream_queue(self.user_id)
