"""``_target_``-based instantiation (plugin config layer).

Behavioral analog of /root/reference/fastvideo/train/utils/instantiate.py:
a YAML node may carry a ``_target_`` dotted path; remaining keys become
constructor kwargs, filtered against the signature so configs stay
forward-compatible when a class drops a parameter.
"""

from __future__ import annotations

import importlib
import inspect
from typing import Any

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


def resolve_target(target: str) -> Any:
    """Import and return the attribute at a fully-qualified dotted path."""
    if not isinstance(target, str) or "." not in target.strip():
        raise ValueError(
            f"_target_ must be a dotted path 'module.Attr', got {target!r}")
    module_path, attr = target.strip().rsplit(".", 1)
    try:
        module = importlib.import_module(module_path)
    except ModuleNotFoundError as exc:
        raise ImportError(
            f"cannot import module {module_path!r} for _target_") from exc
    try:
        return getattr(module, attr)
    except AttributeError as exc:
        raise ImportError(
            f"module {module_path!r} has no attribute {attr!r}") from exc


def instantiate(cfg: dict[str, Any], **extra: Any) -> Any:
    """Instantiate ``cfg['_target_']`` with the remaining keys + ``extra``.

    Keys not accepted by the constructor are dropped with a warning (unless
    it takes **kwargs), mirroring the reference's forward-compat behavior.
    """
    if not isinstance(cfg, dict) or "_target_" not in cfg:
        raise KeyError("instantiate() needs a dict with a '_target_' key")
    cls = resolve_target(str(cfg["_target_"]))
    kwargs = {k: v for k, v in cfg.items() if k != "_target_"}
    kwargs.update(extra)

    sig = inspect.signature(cls.__init__ if inspect.isclass(cls) else cls)
    params = sig.parameters
    if not any(p.kind == inspect.Parameter.VAR_KEYWORD
               for p in params.values()):
        valid = {
            n for n, p in params.items()
            if p.kind in (inspect.Parameter.POSITIONAL_OR_KEYWORD,
                          inspect.Parameter.KEYWORD_ONLY)
        } - {"self"}
        dropped = set(kwargs) - valid
        if dropped:
            logger.warning("instantiate(%s): dropping unrecognized keys %s",
                           cfg["_target_"], sorted(dropped))
            kwargs = {k: v for k, v in kwargs.items() if k in valid}
    return cls(**kwargs)
