"""Orbax sharded checkpoints for training state.

TPU-native analog of the reference's torch-DCP checkpointing
(/root/reference/fastvideo/training/checkpointing_utils.py:12-71,
training_utils.py:109-523): model params, optimizer state, step counter and
RNG key are saved/restored together; RNG is restored LAST on resume
(reference train/trainer.py:128-143 semantics).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: Any, opt_state: Any,
             rng_key: jax.Array, extra: dict | None = None) -> None:
        payload = {
            "model": state,
            "opt": opt_state,
            "rng": np.asarray(jax.random.key_data(rng_key)),
            "meta": {"step": step, **(extra or {})},
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        logger.info("Saved checkpoint at step %d to %s", step,
                    self.directory)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state: Any, opt_state: Any,
                step: int | None = None) -> tuple[Any, Any, jax.Array, dict]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = {
            "model": state,
            "opt": opt_state,
            "rng": np.zeros((2,), np.uint32),
            "meta": {"step": 0},
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        rng = jax.random.wrap_key_data(restored["rng"])
        logger.info("Restored checkpoint step %d", step)
        return restored["model"], restored["opt"], rng, restored["meta"]

    def wait(self) -> None:
        self._mgr.wait_until_finished()
