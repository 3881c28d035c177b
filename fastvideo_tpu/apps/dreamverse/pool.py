"""Device pool: streaming workers leased to sessions.

Behavior analog of /root/reference/apps/dreamverse/dreamverse/
gpu_pool.py (:77-1041): slots with per-user membership, a typed
command/response protocol (INIT/WARMUP/USER_JOIN/USER_STEP/USER_LEAVE/
SHUTDOWN), per-user stream queues, least-loaded allocation and pool
status. TPU deviation: one JAX controller owns all chips, so a slot is
a WORKER THREAD driving a streaming generator (the reference forks one
subprocess per GPU with CUDA_VISIBLE_DEVICES); media events flow
through thread-safe queues instead of multiprocessing pipes.
"""

from __future__ import annotations

import enum
import queue
import threading
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable

from fastvideo_tpu.apps.dreamverse.messages import (MediaChunk,
                                                    MediaComplete,
                                                    MediaInit)
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class CommandType(enum.Enum):
    """Reference gpu_pool.py:77-88."""

    INIT = "init"
    WARMUP = "warmup"
    SHUTDOWN = "shutdown"
    USER_JOIN = "user_join"
    USER_STEP = "user_step"
    USER_LEAVE = "user_leave"
    RELOAD_MODEL = "reload_model"
    APPLY_LORA = "apply_lora"


@dataclass
class Command:
    type: CommandType
    payload: Any = None
    user_id: str | None = None


# worker factory: () -> object with reset/step(prompt, **kw) -> frames
WorkerFactory = Callable[[], Any]


class _EchoWorker:
    """Default worker for tests / mock serving: emits the prompt bytes
    as a single media chunk per step."""

    def reset(self, **kwargs) -> None:
        self.kwargs = kwargs

    def step(self, prompt: str, **kwargs) -> bytes:
        return prompt.encode()


@dataclass
class DeviceSlot:
    """One leased worker (reference GPUSlot :415-560)."""

    slot_id: int
    max_users: int = 1
    users: set[str] = field(default_factory=set)
    busy: bool = False

    @property
    def client_count(self) -> int:
        return len(self.users)

    @property
    def is_available(self) -> bool:
        return len(self.users) < self.max_users

    @property
    def is_empty(self) -> bool:
        return not self.users


class DevicePool:
    """Slots + worker threads + per-user stream queues
    (reference GPUPool :845-1041)."""

    def __init__(self, num_slots: int = 1, max_users_per_slot: int = 1,
                 worker_factory: WorkerFactory | None = None):
        self.slots = [DeviceSlot(slot_id=i, max_users=max_users_per_slot)
                      for i in range(num_slots)]
        self._worker_factory = worker_factory or _EchoWorker
        self._commands: dict[int, queue.Queue] = {
            s.slot_id: queue.Queue() for s in self.slots}
        self._stream_queues: dict[str, queue.Queue] = {}
        self._user_slot: dict[str, int] = {}
        self._segment_idx: dict[str, int] = {}
        self._threads: dict[int, threading.Thread] = {}
        self._lock = threading.Lock()
        self._shutdown = False
        for s in self.slots:
            t = threading.Thread(target=self._worker_loop,
                                 args=(s.slot_id,), daemon=True)
            self._threads[s.slot_id] = t
            t.start()

    # -- client API ----------------------------------------------------------

    def register_stream_queue(self, user_id: str) -> queue.Queue:
        """Reference :680-688."""
        q: queue.Queue = queue.Queue()
        with self._lock:
            self._stream_queues[user_id] = q
        return q

    def unregister_stream_queue(self, user_id: str) -> None:
        with self._lock:
            self._stream_queues.pop(user_id, None)

    def acquire(self, user_id: str) -> DeviceSlot | None:
        """Least-loaded available slot, or None when saturated."""
        with self._lock:
            candidates = [s for s in self.slots if s.is_available]
            if not candidates:
                return None
            slot = min(candidates, key=lambda s: s.client_count)
            slot.users.add(user_id)
            self._user_slot[user_id] = slot.slot_id
            self._segment_idx[user_id] = 0
        self._commands[slot.slot_id].put(
            Command(CommandType.USER_JOIN, user_id=user_id))
        return slot

    def release(self, user_id: str) -> None:
        with self._lock:
            slot_id = self._user_slot.pop(user_id, None)
            self._segment_idx.pop(user_id, None)
            if slot_id is None:
                return
            self.slots[slot_id].users.discard(user_id)
        self._commands[slot_id].put(
            Command(CommandType.USER_LEAVE, user_id=user_id))

    def submit_step(self, user_id: str, prompt: str, **kwargs) -> None:
        """Queue one segment generation for the user's slot."""
        slot_id = self._user_slot.get(user_id)
        if slot_id is None:
            raise KeyError(f"user {user_id} holds no slot")
        self._commands[slot_id].put(
            Command(CommandType.USER_STEP,
                    payload={"prompt": prompt, **kwargs},
                    user_id=user_id))

    def reload_model(self, slot_id: int | None = None, **payload) -> None:
        """Hot-swap the worker model on one slot or all slots
        (reference CommandType.RELOAD_MODEL)."""
        targets = [slot_id] if slot_id is not None else \
            [s.slot_id for s in self.slots]
        for sid in targets:
            self._commands[sid].put(Command(CommandType.RELOAD_MODEL,
                                            payload=payload))

    def apply_lora(self, slot_id: int | None = None, **payload) -> None:
        """Apply a LoRA adapter on one slot or all slots
        (reference CommandType.APPLY_LORA)."""
        targets = [slot_id] if slot_id is not None else \
            [s.slot_id for s in self.slots]
        for sid in targets:
            self._commands[sid].put(Command(CommandType.APPLY_LORA,
                                            payload=payload))

    def get_status(self) -> dict:
        """Reference :993-1040."""
        with self._lock:
            return {
                "num_slots": len(self.slots),
                "slots": [{
                    "slot_id": s.slot_id,
                    "users": sorted(s.users),
                    "busy": s.busy,
                    "available": s.is_available,
                } for s in self.slots],
                "total_users": len(self._user_slot),
            }

    def shutdown(self) -> None:
        self._shutdown = True
        for slot_id, q in self._commands.items():
            q.put(Command(CommandType.SHUTDOWN))
        for t in self._threads.values():
            t.join(timeout=5)

    # -- worker loop ---------------------------------------------------------

    def _publish(self, user_id: str, event: Any) -> None:
        q = self._stream_queues.get(user_id)
        if q is not None:
            q.put(event)

    def _worker_loop(self, slot_id: int) -> None:
        worker = None
        sessions: dict[str, Any] = {}
        commands = self._commands[slot_id]
        slot = self.slots[slot_id]
        while True:
            cmd = commands.get()
            if cmd.type == CommandType.SHUTDOWN:
                return
            if cmd.type == CommandType.INIT or (
                    worker is None and cmd.type != CommandType.USER_LEAVE):
                if worker is None:
                    worker = self._worker_factory()
            if cmd.type == CommandType.USER_JOIN:
                first_user = not sessions
                sessions[cmd.user_id] = worker
                # Only reset for the first user on the slot: with
                # max_users_per_slot > 1 the worker is shared, and a reset
                # here would silently restart an existing user's stream.
                if first_user and hasattr(worker, "reset"):
                    worker.reset()
                continue
            if cmd.type == CommandType.USER_LEAVE:
                sessions.pop(cmd.user_id, None)
                continue
            if cmd.type == CommandType.WARMUP:
                if hasattr(worker, "warmup"):
                    worker.warmup()
                continue
            if cmd.type == CommandType.RELOAD_MODEL:
                if hasattr(worker, "reload_model"):
                    worker.reload_model(**(cmd.payload or {}))
                else:
                    worker = self._worker_factory()
                    for uid in list(sessions):
                        sessions[uid] = worker
                continue
            if cmd.type == CommandType.APPLY_LORA:
                if hasattr(worker, "apply_lora"):
                    worker.apply_lora(**(cmd.payload or {}))
                else:
                    logger.warning("slot %d worker has no apply_lora",
                                   slot_id)
                continue
            if cmd.type == CommandType.USER_STEP:
                user_id = cmd.user_id
                payload = dict(cmd.payload or {})
                prompt = payload.pop("prompt", "")
                seg = self._segment_idx.get(user_id, 0)
                stream_id = uuid.uuid4().hex[:8]
                slot.busy = True
                try:
                    data = worker.step(prompt, **payload)
                    self._publish(user_id, MediaInit(
                        user_id=user_id, segment_idx=seg,
                        stream_id=stream_id))
                    if isinstance(data, (bytes, bytearray)):
                        chunks = [bytes(data)]
                    else:
                        chunks = [bytes(c) for c in data]
                    for c in chunks:
                        self._publish(user_id, MediaChunk(
                            user_id=user_id, segment_idx=seg,
                            stream_id=stream_id, chunk=c))
                    self._publish(user_id, MediaComplete(
                        user_id=user_id, segment_idx=seg,
                        stream_id=stream_id, chunks=len(chunks)))
                    self._segment_idx[user_id] = seg + 1
                except Exception as exc:
                    logger.exception("slot %d step failed", slot_id)
                    self._publish(user_id, {"error": str(exc),
                                            "segment_idx": seg})
                finally:
                    slot.busy = False
