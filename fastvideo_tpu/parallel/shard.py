"""Metadata-driven parameter sharding (TP + FSDP) over the global mesh.

TPU-native replacement for the reference's per-rank weight splitting
(/root/reference/fastvideo/layers/linear.py:344,922 splits torch weights and
all-reduces with NCCL; /root/reference/fastvideo/training/training_utils.py
wraps modules in torch FSDP). Here parameters carry declarative ``tp_axes``
metadata on their :class:`nnx.Variable` (set by the layers in
``fastvideo_tpu.layers.linear``); this module turns that metadata into
``NamedSharding``s and lets GSPMD insert all collectives.

Combination rule per parameter:

* dims named by ``tp_axes`` are sharded on those mesh axes (usually ``tp``);
* if an ``fsdp_axis`` is given, the largest remaining dim whose size divides
  the axis is additionally sharded (ZeRO-3-style) when the parameter is big
  enough to be worth it;
* everything else is replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["param_spec", "state_specs", "shard_state"]


def param_spec(shape: tuple[int, ...], tp_axes: tuple[str | None, ...] | None,
               mesh: Mesh, fsdp_axis: str | None = None,
               min_fsdp_size: int = 2**16) -> P:
    """PartitionSpec for one parameter from declared metadata + FSDP rule."""
    ndim = len(shape)
    size = 1
    for s in shape:
        size *= s
    spec: list[Any] = [None] * ndim
    if tp_axes:
        for d, ax in enumerate(tp_axes[:ndim]):
            if ax is None:
                continue
            ax_size = mesh.shape.get(ax, 1)
            if ax_size > 1 and shape[d] % ax_size == 0:
                spec[d] = ax
    if fsdp_axis is not None and mesh.shape.get(fsdp_axis, 1) > 1 \
            and size >= min_fsdp_size:
        fsdp_size = mesh.shape[fsdp_axis]
        for d in sorted(range(ndim), key=lambda d: -shape[d]):
            if spec[d] is None and shape[d] % fsdp_size == 0:
                spec[d] = fsdp_axis
                break
    return P(*spec)


def _is_var(x: Any) -> bool:
    return isinstance(x, nnx.Variable)


def state_specs(tree: Any, mesh: Mesh, fsdp_axis: str | None = None,
                min_fsdp_size: int = 2**16) -> Any:
    """Tree of PartitionSpecs matching ``tree`` (nnx.State or any pytree).

    Works on optimizer states too: optax's ``mu``/``nu`` mirror the params
    State *including* metadata, so moments inherit the parameters' layout.
    """

    def spec_of(x: Any) -> P:
        if _is_var(x):
            val = x.get_value() if hasattr(x, "get_value") else x.value
            if not hasattr(val, "shape"):
                return P()
            return param_spec(val.shape, getattr(x, "tp_axes", None), mesh,
                              fsdp_axis, min_fsdp_size)
        if hasattr(x, "shape"):
            return param_spec(x.shape, None, mesh, fsdp_axis, min_fsdp_size)
        return P()

    return jax.tree.map(spec_of, tree, is_leaf=_is_var)


def shard_state(tree: Any, mesh: Mesh, fsdp_axis: str | None = None,
                min_fsdp_size: int = 2**16) -> Any:
    """device_put every leaf of ``tree`` per its metadata-derived spec.

    Accepts an ``nnx.State`` (from ``nnx.split``), an optax opt-state, or any
    mixed pytree of Variables and arrays; Variables are rebuilt with their
    metadata intact so downstream ``nnx.merge`` works.
    """

    def place(x: Any) -> Any:
        if _is_var(x):
            val = x.get_value() if hasattr(x, "get_value") else x.value
            if not hasattr(val, "shape"):
                return x
            spec = param_spec(val.shape, getattr(x, "tp_axes", None), mesh,
                              fsdp_axis, min_fsdp_size)
            return x.replace(jax.device_put(val, NamedSharding(mesh, spec)))
        if hasattr(x, "shape"):
            spec = param_spec(x.shape, None, mesh, fsdp_axis, min_fsdp_size)
            return jax.device_put(x, NamedSharding(mesh, spec))
        return x

    return jax.tree.map(place, tree, is_leaf=_is_var)
