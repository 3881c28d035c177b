"""Dreamverse configuration (reference dreamverse/config.py:56-120).

Only consumed knobs are declared; everything is overridable by env or
the :class:`DreamverseConfig` constructor.
"""

from __future__ import annotations

import dataclasses
import os

MODEL_REGISTRY = {
    "fast-ltx2": {
        "name": "FastLTX2",
        "model_path": "FastVideo/LTX2-Distilled-Diffusers",
    },
    "fast-wan-causal": {
        "name": "FastWan Causal",
        "model_path": "FastVideo/FastWan2.1-T2V-1.3B-Causal-Diffusers",
    },
}

DEFAULT_MODEL_ID = "fast-ltx2"


@dataclasses.dataclass(frozen=True)
class DreamverseConfig:
    """Session/generation limits (reference config.py constants)."""

    model_id: str = DEFAULT_MODEL_ID
    session_timeout_s: float = 300.0
    generation_segment_cap: int = 16
    prompt_timeout_ms: int = 20_000
    prompt_auto_timeout_ms: int = 8_000
    prompt_auto_sleep_ms: int = 250
    num_frames: int = 121
    frame_height: int = 480
    frame_width: int = 832
    num_inference_steps: int = 5

    @classmethod
    def from_env(cls) -> "DreamverseConfig":
        model_id = os.getenv("DREAMVERSE_MODEL_ID", "").strip() \
            or DEFAULT_MODEL_ID
        if model_id not in MODEL_REGISTRY:
            model_id = DEFAULT_MODEL_ID
        kwargs = {"model_id": model_id}
        cap = os.getenv("DREAMVERSE_SEGMENT_CAP", "").strip()
        if cap.isdigit():
            kwargs["generation_segment_cap"] = int(cap)
        timeout = os.getenv("DREAMVERSE_SESSION_TIMEOUT_S", "").strip()
        if timeout:
            try:
                kwargs["session_timeout_s"] = float(timeout)
            except ValueError:
                pass
        return cls(**kwargs)

    @property
    def model_path(self) -> str:
        return MODEL_REGISTRY[self.model_id]["model_path"]
