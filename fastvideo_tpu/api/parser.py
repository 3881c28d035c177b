"""Dict -> typed config tree parser with path-tracked validation.

Analog of /root/reference/fastvideo/api/parser.py: walks nested dicts
into the schema dataclasses, rejects unknown keys with the full path,
and records which paths the user set explicitly (so serve-time merges
only apply operator-written defaults, reference api/schema.py ServeConfig
docstring).
"""

from __future__ import annotations

import dataclasses
import json
import typing
from typing import Any

from fastvideo_tpu.api.errors import ConfigValidationError, UnknownFieldError

EXPLICIT_PATHS_ATTR = "_fastvideo_explicit_paths"


def _is_dataclass_type(tp) -> bool:
    return isinstance(tp, type) and dataclasses.is_dataclass(tp)


def _unwrap_optional(tp):
    origin = typing.get_origin(tp)
    # typing.Union covers Optional[X]; types.UnionType covers PEP 604
    # ``X | None`` (what the schema files actually use — on 3.12 its
    # origin is NOT typing.Union)
    import types

    if origin is typing.Union or origin is types.UnionType:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return tp


def parse_dataclass(cls, data: dict[str, Any], path: str = "",
                    explicit: set[str] | None = None):
    """Build ``cls`` from a nested dict; raise on unknown keys."""
    if not isinstance(data, dict):
        raise ConfigValidationError(path or cls.__name__,
                                    f"expected a mapping, got {type(data)}")
    fields = {f.name: f for f in dataclasses.fields(cls)}
    # resolve postponed annotations once per class
    hints = typing.get_type_hints(cls)
    kwargs = {}
    explicit = explicit if explicit is not None else set()
    for key, value in data.items():
        fpath = f"{path}.{key}" if path else key
        f = fields.get(key)
        if f is None:
            raise UnknownFieldError(
                fpath, f"unknown field; valid: {sorted(fields)}")
        ftype = _unwrap_optional(hints.get(key, f.type))
        if _is_dataclass_type(ftype) and isinstance(value, dict):
            kwargs[key] = parse_dataclass(ftype, value, fpath, explicit)
        else:
            kwargs[key] = value
            explicit.add(fpath)
    try:
        obj = cls(**kwargs)
    except TypeError as e:
        raise ConfigValidationError(path, str(e)) from None
    object.__setattr__(obj, EXPLICIT_PATHS_ATTR, frozenset(
        p for p in explicit if not path or p.startswith(path)))
    return obj


def explicit_paths(obj) -> frozenset[str]:
    return getattr(obj, EXPLICIT_PATHS_ATTR, frozenset())


def effective_explicit_paths(obj) -> frozenset[str]:
    """Explicit paths for any request object.

    Objects built by :func:`parse_dataclass` carry the recorded set; for
    programmatically-constructed dataclasses (no attr), fall back to a
    diff against a default-constructed instance — a field that differs
    from its default counts as explicitly set, so preset defaults never
    clobber user-set values."""
    recorded = getattr(obj, EXPLICIT_PATHS_ATTR, None)
    if recorded is not None:
        return recorded

    def walk(o, default, path: str, out: set[str]) -> None:
        for f in dataclasses.fields(o):
            v = getattr(o, f.name)
            d = getattr(default, f.name)
            p = f"{path}.{f.name}" if path else f.name
            if dataclasses.is_dataclass(v) and not isinstance(v, type):
                walk(v, d, p, out)
            elif v != d:
                out.add(p)

    out: set[str] = set()
    try:
        walk(obj, type(obj)(), "", out)
    except TypeError:  # non-default-constructible; treat all as explicit
        return frozenset(
            f.name for f in dataclasses.fields(obj))
    return frozenset(out)


def load_config_file(cls, path: str):
    """Load a JSON (or simple YAML) config file into a schema dataclass."""
    with open(path) as fh:
        text = fh.read()
    data: Any
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        data = _parse_simple_yaml(text)
    return parse_dataclass(cls, data)


def _parse_simple_yaml(text: str) -> dict[str, Any]:
    """Minimal YAML subset parser (mappings, scalars, inline lists) —
    PyYAML isn't a hard dependency; full YAML files also parse when
    PyYAML happens to be installed."""
    try:
        import yaml  # type: ignore

        return yaml.safe_load(text)
    except ImportError:
        pass
    root: dict[str, Any] = {}
    stack: list[tuple[int, dict[str, Any]]] = [(-1, root)]
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        indent = len(line) - len(line.lstrip())
        key, _, rest = line.strip().partition(":")
        while stack and indent <= stack[-1][0]:
            stack.pop()
        parent = stack[-1][1] if stack else root
        rest = rest.strip()
        if not rest:
            child: dict[str, Any] = {}
            parent[key] = child
            stack.append((indent, child))
        else:
            parent[key] = _coerce_scalar(rest)
    return root


def _coerce_scalar(s: str) -> Any:
    low = s.lower()
    if low in ("true", "yes"):
        return True
    if low in ("false", "no"):
        return False
    if low in ("null", "none", "~"):
        return None
    if s.startswith("[") and s.endswith("]"):
        inner = s[1:-1].strip()
        return ([] if not inner
                else [_coerce_scalar(x.strip()) for x in inner.split(",")])
    if s.startswith(("'", '"')) and s.endswith(("'", '"')):
        return s[1:-1]
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s
