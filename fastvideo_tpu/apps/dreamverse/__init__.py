"""Dreamverse: real-time interactive world-model streaming backend.

Behavior analog of /root/reference/apps/dreamverse/dreamverse/: a device
pool leasing streaming workers to WebSocket sessions, a prompt pipeline
(safety filter -> enhancer -> ready queue with auto-advance), and a
session controller driving segment-by-segment generation. TPU
deviations are documented per module (threads over one JAX controller
instead of per-GPU subprocesses; rule-based safety fallback when
fasttext classifiers are absent).
"""

from fastvideo_tpu.apps.dreamverse.config import (DEFAULT_MODEL_ID,
                                                  MODEL_REGISTRY,
                                                  DreamverseConfig)
from fastvideo_tpu.apps.dreamverse.messages import (MediaChunk,
                                                    MediaComplete,
                                                    MediaInit,
                                                    PromptSubmission,
                                                    ReadyPrompt)
from fastvideo_tpu.apps.dreamverse.pool import (Command, CommandType,
                                                DevicePool, DeviceSlot)
from fastvideo_tpu.apps.dreamverse.prompt_enhancer import (EnhanceResult,
                                                           PromptEnhancer,
                                                           RewriteResult)
from fastvideo_tpu.apps.dreamverse.prompt_safety import (BlockedPrompt,
                                                         PromptSafetyFilter)
from fastvideo_tpu.apps.dreamverse.session import SessionController

__all__ = [
    "BlockedPrompt",
    "Command",
    "CommandType",
    "DEFAULT_MODEL_ID",
    "DevicePool",
    "DeviceSlot",
    "DreamverseConfig",
    "EnhanceResult",
    "MediaChunk",
    "MediaComplete",
    "MediaInit",
    "MODEL_REGISTRY",
    "PromptEnhancer",
    "PromptSafetyFilter",
    "PromptSubmission",
    "ReadyPrompt",
    "RewriteResult",
    "SessionController",
]
