"""TrainingMethod plugin base + registry.

TPU-native analog of the reference's method plugin layer
(/root/reference/fastvideo/train/methods/base.py: ``TrainingMethod`` owns
its role models and optimizers; /root/reference/fastvideo/train/trainer.py
resolves methods from YAML via ``_target_``). Here a method owns one or more
jitted train steps over (params, opt_state) pytrees and is resolved by
registry name or dotted ``_target_`` path — no if/elif forks in the
entrypoint.
"""

from __future__ import annotations

import abc
from typing import TYPE_CHECKING, Any, Callable, ClassVar

from fastvideo_tpu.logger import init_logger

if TYPE_CHECKING:
    from fastvideo_tpu.entrypoints.cli.train import TrainRunConfig

logger = init_logger(__name__)

_METHOD_REGISTRY: dict[str, type["TrainingMethod"]] = {}


def register_method(cls: type["TrainingMethod"]) -> type["TrainingMethod"]:
    """Class decorator: register under ``cls.name``."""
    if not getattr(cls, "name", None):
        raise ValueError(f"{cls.__name__} must define a class-level `name`")
    _METHOD_REGISTRY[cls.name] = cls
    return cls


def list_methods() -> list[str]:
    return sorted(_METHOD_REGISTRY)


def resolve_method(spec: str | dict[str, Any]) -> type["TrainingMethod"]:
    """Resolve a method class from a registry name or a ``_target_`` dict."""
    if isinstance(spec, dict):
        from fastvideo_tpu.training.instantiate import resolve_target
        cls = resolve_target(str(spec.get("_target_", "")))
    else:
        if spec not in _METHOD_REGISTRY and "." in spec:
            from fastvideo_tpu.training.instantiate import resolve_target
            cls = resolve_target(spec)
        elif spec in _METHOD_REGISTRY:
            cls = _METHOD_REGISTRY[spec]
        else:
            raise ValueError(
                f"Unknown training method {spec!r}; registered: "
                f"{list_methods()} (or pass a dotted _target_ path)")
    if not (isinstance(cls, type) and issubclass(cls, TrainingMethod)):
        raise TypeError(f"{cls!r} is not a TrainingMethod subclass")
    return cls


class TrainingMethod(abc.ABC):
    """Algorithm layer: owns role models + jitted steps, drives training.

    Subclasses register with :func:`register_method` and implement
    :meth:`from_config` (construct role models from the run config) plus the
    step/loop protocol below. Checkpointing flows through the method so
    multi-role algorithms (DMD's generator/critic) save every role.
    """

    name: ClassVar[str] = ""

    @classmethod
    @abc.abstractmethod
    def from_config(cls, cfg: "TrainRunConfig") -> "TrainingMethod":
        """Build the method (role models, optimizers) from a run config."""

    @property
    @abc.abstractmethod
    def args(self) -> Any:
        """The TrainingArgs in effect (max steps, ckpt cadence, ...)."""

    @abc.abstractmethod
    def train(self, dataloader: Any, max_steps: int | None = None,
              **kwargs: Any) -> None:
        """Run the full training loop over ``dataloader``."""

    def save_checkpoint(self) -> None:  # optional
        logger.warning("%s does not implement checkpointing", self.name)

    def resume_from_checkpoint(self, step: int | None = None) -> None:
        raise NotImplementedError(
            f"{self.name} does not implement checkpoint resume")


class PipelineMethod(TrainingMethod):
    """Adapter: wraps a round-1 pipeline object (which already exposes
    ``train/train_one_step/save_checkpoint/resume_from_checkpoint/args``)
    behind the method protocol."""

    def __init__(self, pipeline: Any):
        self.pipeline = pipeline

    @property
    def args(self) -> Any:
        return self.pipeline.args

    def train(self, dataloader, max_steps=None, **kwargs) -> None:
        self.pipeline.train(dataloader, max_steps=max_steps, **kwargs)

    def save_checkpoint(self) -> None:
        if hasattr(self.pipeline, "save_checkpoint"):
            self.pipeline.save_checkpoint()
        else:
            super().save_checkpoint()

    def resume_from_checkpoint(self, step: int | None = None) -> None:
        self.pipeline.resume_from_checkpoint(step)

    def __getattr__(self, item: str) -> Any:
        return getattr(self.pipeline, item)
