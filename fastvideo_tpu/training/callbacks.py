"""Composable training callbacks.

Behavioral reference: /root/reference/fastvideo/train/callbacks/
(callback.py:30-181, grad_clip.py, ema.py, validation.py): named callbacks
instantiated from YAML (builtin names need no ``_target_``), dispatched at
train-start / step-end / before-optimizer / train-end, with state_dict
round-tripping through checkpoints.

TPU shape: gradient clipping happens INSIDE the jitted train step (one XLA
program — reference clips between backward and step, which would force a
host sync here), so ``GradNormClipCallback`` configures the threshold the
step compiles with and logs the grad norms the step reports. The EMA
shadow is a params-pytree updated by one fused jitted multiply-add per
step.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

_BUILTIN_CALLBACKS = {
    "grad_clip": "fastvideo_tpu.training.callbacks.GradNormClipCallback",
    "validation": "fastvideo_tpu.training.callbacks.ValidationCallback",
    "ema": "fastvideo_tpu.training.callbacks.EMACallback",
}


class Callback:
    """Base callback with no-op hooks (reference callback.py:30-98)."""

    name: str = ""
    method: Any = None

    def on_train_start(self, method, iteration: int = 0) -> None:
        pass

    def on_training_step_end(self, method, loss_dict: dict[str, Any],
                             iteration: int = 0) -> None:
        pass

    def on_before_optimizer_step(self, method, iteration: int = 0) -> None:
        pass

    def on_train_end(self, method, iteration: int = 0) -> None:
        pass

    def state_dict(self) -> dict[str, Any]:
        return {}

    def load_state_dict(self, state_dict: dict[str, Any]) -> None:
        pass


class CallbackDict:
    """Instantiate named callbacks and fan hook calls out to all of them
    (reference callback.py:100-181)."""

    def __init__(self, callback_configs: dict[str, dict[str, Any]] | None):
        self._callbacks: dict[str, Callback] = {}
        for name, cb_cfg in (callback_configs or {}).items():
            cb_cfg = dict(cb_cfg or {})
            target = cb_cfg.pop("_target_",
                                _BUILTIN_CALLBACKS.get(name))
            if target is None:
                logger.warning("Callback %r missing _target_; skipping",
                               name)
                continue
            if isinstance(target, str):
                from fastvideo_tpu.training.instantiate import (
                    resolve_target)

                target = resolve_target(target)
            cb = target(**cb_cfg)
            if not isinstance(cb, Callback):
                raise TypeError(
                    f"Callback {name!r} resolved to "
                    f"{type(cb).__name__}, expected a Callback subclass")
            cb.name = name
            self._callbacks[name] = cb

    def __iter__(self):
        return iter(self._callbacks.values())

    def __getitem__(self, name: str) -> Callback:
        return self._callbacks[name]

    def __len__(self) -> int:
        return len(self._callbacks)

    def state_dict(self) -> dict[str, Any]:
        return {n: cb.state_dict() for n, cb in self._callbacks.items()}

    def load_state_dict(self, state_dict: dict[str, Any]) -> None:
        for n, cb in self._callbacks.items():
            if n in state_dict:
                cb.load_state_dict(state_dict[n])

    def dispatch(self, hook: str, *args, **kwargs) -> None:
        for cb in self._callbacks.values():
            getattr(cb, hook)(*args, **kwargs)


def normalize_callbacks(callbacks) -> "CallbackDict | None":
    """Accept a CallbackDict, a raw ``{name: cfg}`` dict, or None."""
    if callbacks is None or isinstance(callbacks, CallbackDict):
        return callbacks
    return CallbackDict(callbacks)


class GradNormClipCallback(Callback):
    """Configure the jitted step's clip threshold; log its grad norms
    (reference grad_clip.py:24-61)."""

    def __init__(self, *, max_grad_norm: float = 1.0,
                 log_grad_norms: bool = True):
        self.max_grad_norm = float(max_grad_norm)
        self.log_grad_norms = bool(log_grad_norms)

    def on_train_start(self, method, iteration: int = 0) -> None:
        args = getattr(method, "args", None)
        if args is not None and self.max_grad_norm > 0 and \
                args.max_grad_norm != self.max_grad_norm:
            args.max_grad_norm = self.max_grad_norm
            # the step function compiled with the old threshold; rebuild
            if hasattr(method, "_build_train_step"):
                method._train_step = method._build_train_step()

    def on_training_step_end(self, method, loss_dict, iteration=0) -> None:
        tracker = getattr(method, "tracker", None)
        grad_norm = loss_dict.get("grad_norm")
        if self.log_grad_norms and tracker is not None and \
                grad_norm is not None:
            tracker.log({"grad_norm/transformer": float(grad_norm)},
                        iteration)


class EMACallback(Callback):
    """Exponential moving average of the trained params
    (reference ema.py:26-154). The shadow is a params pytree; the decay
    update is one fused jitted multiply-add per step."""

    def __init__(self, *, decay: float = 0.9999, start_iter: int = 0):
        self.decay = float(decay)
        self.start_iter = int(start_iter)
        self.shadow = None
        self._update = None

    def _get_params(self, method):
        state = getattr(method, "state", None)
        if state is not None and getattr(state, "params", None) is not None:
            return state.params
        raise ValueError("EMACallback: method has no .state.params")

    def on_train_start(self, method, iteration: int = 0) -> None:
        self.shadow = jax.tree.map(jnp.copy, self._get_params(method))
        decay = self.decay

        @jax.jit
        def update(shadow, params):
            return jax.tree.map(
                lambda s, p: s * decay + p.astype(s.dtype) * (1 - decay),
                shadow, params)

        self._update = update
        logger.info("EMA callback enabled (decay=%s, start_iter=%d)",
                    self.decay, self.start_iter)

    def on_training_step_end(self, method, loss_dict, iteration=0) -> None:
        if iteration < self.start_iter:
            return
        params = self._get_params(method)
        if iteration == self.start_iter and self.start_iter > 0:
            self.shadow = jax.tree.map(jnp.copy, params)
            return
        self.shadow = self._update(self.shadow, params)

    @contextlib.contextmanager
    def ema_context(self, method):
        """Temporarily swap EMA weights into the live model."""
        live = self._get_params(method)
        method.state.params = self.shadow
        try:
            yield
        finally:
            method.state.params = live

    def state_dict(self) -> dict[str, Any]:
        import numpy as np

        if self.shadow is None:
            return {}
        flat = jax.tree.leaves(self.shadow)
        return {"decay": self.decay,
                "shadow_flat": [np.asarray(leaf) for leaf in flat]}

    def load_state_dict(self, state_dict: dict[str, Any]) -> None:
        if not state_dict or self.shadow is None:
            return
        flat = state_dict.get("shadow_flat")
        if flat is None:
            return
        treedef = jax.tree.structure(self.shadow)
        self.shadow = jax.tree.unflatten(
            treedef, [jnp.asarray(leaf) for leaf in flat])


class ValidationCallback(Callback):
    """Run few-step validation sampling every ``every_n_steps``
    (reference validation.py; our TrainingPipeline.validation_sample)."""

    def __init__(self, *, every_n_steps: int = 500, prompt: str = "",
                 num_inference_steps: int = 4, use_ema: bool = False,
                 dataset_path: str = "", max_samples: int = 4):
        self.every_n_steps = int(every_n_steps)
        self.prompt = prompt
        self.num_inference_steps = int(num_inference_steps)
        self.use_ema = bool(use_ema)
        # a validation file (csv/json/parquet — dataset/validation.py,
        # reference validation_dataset.py): its prompts are sampled in turn
        # at each validation event, capped at max_samples per event
        self.max_samples = int(max_samples)
        self._val_prompts: list[str] = []
        if dataset_path:
            from fastvideo_tpu.dataset.validation import ValidationDataset

            self._val_prompts = [s["prompt"]
                                 for s in ValidationDataset(dataset_path)]

    def on_training_step_end(self, method, loss_dict, iteration=0) -> None:
        if self.every_n_steps <= 0 or iteration == 0 or \
                iteration % self.every_n_steps != 0:
            return
        sample_fn = getattr(method, "validation_sample", None)
        if sample_fn is None:
            return
        ctx = contextlib.nullcontext()
        if self.use_ema:
            for cb in getattr(method, "_callbacks", []) or []:
                if isinstance(cb, EMACallback):
                    ctx = cb.ema_context(method)
                    break
        # only pass kwargs the implementation accepts; skip (don't crash
        # training) when it needs positional data the callback can't
        # supply (e.g. TrainingPipeline.validation_sample(embeds, shape))
        import inspect

        try:
            sig = inspect.signature(sample_fn)
        except (TypeError, ValueError):
            sig = None
        kwargs = {"prompt": self.prompt or None,
                  "num_inference_steps": self.num_inference_steps}
        if sig is not None:
            accepted = set(sig.parameters)
            kwargs = {k: v for k, v in kwargs.items() if k in accepted}
            missing = [
                n for n, p in sig.parameters.items()
                if p.default is inspect.Parameter.empty
                and p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)
                and n not in kwargs
            ]
            if missing:
                if not getattr(self, "_warned_signature", False):
                    self._warned_signature = True
                    logger.warning(
                        "validation callback: %s.validation_sample needs "
                        "%s which the callback cannot supply; skipping "
                        "validation sampling", type(method).__name__,
                        missing)
                return
        prompt_sets: list[dict] = [kwargs]
        if self._val_prompts and "prompt" in kwargs:
            prompt_sets = [{**kwargs, "prompt": p}
                           for p in self._val_prompts[:self.max_samples]]
        with ctx:
            metrics = None
            for kw in prompt_sets:
                metrics = sample_fn(**kw)
        tracker = getattr(method, "tracker", None)
        if tracker is not None and isinstance(metrics, dict):
            tracker.log({f"validation/{k}": v
                         for k, v in metrics.items()
                         if isinstance(v, (int, float))}, iteration)
