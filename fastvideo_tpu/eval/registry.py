"""Class-based metric registry with group resolution.

Behavioral reference: /root/reference/fastvideo/eval/registry.py (:1-103):
``@register(name)`` decorator, ``get_metric`` with dependency checks,
``resolve_group`` for prefix selectors (``"vbench"`` → every
``vbench.*``), ``missing_dependencies`` for silent group-skip.

Zero-egress addition: availability also checks the metric's
``weights_env`` gate (a local-weights path), since model checkpoints
cannot be downloaded here.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from fastvideo_tpu.eval.base import BaseMetric

_REGISTRY: dict[str, type["BaseMetric"]] = {}

# modules whose import registers the built-in metric classes
_BUILTIN_MODULES = (
    "fastvideo_tpu.eval.suite.common",
    "fastvideo_tpu.eval.suite.optical_flow",
    "fastvideo_tpu.eval.suite.vbench",
    "fastvideo_tpu.eval.suite.vbench_semantic",
    "fastvideo_tpu.eval.suite.audio",
    "fastvideo_tpu.eval.suite.audio_models",
    "fastvideo_tpu.eval.suite.physics_iq",
    "fastvideo_tpu.eval.suite.judge",
    "fastvideo_tpu.eval.suite.videoscore2",
)
_loaded_builtins = False


def load_builtin_metrics() -> None:
    global _loaded_builtins
    if _loaded_builtins:
        return
    _loaded_builtins = True
    for mod in _BUILTIN_MODULES:
        importlib.import_module(mod)


def register(name: str):
    def deco(cls):
        cls.name = name
        _REGISTRY[name] = cls
        return cls

    return deco


def list_metric_classes() -> list[str]:
    load_builtin_metrics()
    return sorted(_REGISTRY)


def get_metric(name: str, **kwargs: Any) -> "BaseMetric":
    load_builtin_metrics()
    cls = _REGISTRY.get(name)
    if cls is None:
        raise KeyError(f"Unknown metric {name!r}. Available: "
                       f"{', '.join(sorted(_REGISTRY))}")
    missing = missing_dependencies(name)
    if missing:
        raise ImportError(f"{cls.__name__} is unavailable: {missing}")
    return cls(**kwargs)


def missing_dependencies(name: str) -> list[str]:
    """Unimportable modules and unset/absent weights gates for *name*.
    Empty list = metric can run in this environment."""
    load_builtin_metrics()
    cls = _REGISTRY.get(name)
    if cls is None:
        return []
    missing = [d for d in getattr(cls, "dependencies", [])
               if importlib.util.find_spec(d) is None]
    env = getattr(cls, "weights_env", None)
    if env:
        path = os.environ.get(env, "")
        if not path or not os.path.exists(path):
            missing.append(f"${env} (local weights path)")
    return missing


def resolve_group(name: str) -> list[str] | None:
    """``"vbench"`` → all ``vbench.*`` names; None if not a group."""
    load_builtin_metrics()
    prefix = name + "."
    matches = sorted(k for k in _REGISTRY if k.startswith(prefix))
    return matches or None
