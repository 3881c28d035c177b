"""Checkpoint-tensor -> module-parameter assignment utilities.

Core of the diffusers-format reader (analog of
/root/reference/fastvideo/models/loader/component_loader.py:50-1370 +
fsdp_load.py): checkpoint names are rewritten through per-model regex tables
(``param_names_mapping``), then assigned onto the nnx module tree with the
torch->JAX layout conversions:

* ``Linear.weight [out, in]``      -> ``kernel [in, out]`` (transpose)
* ``Conv3d patch-embed weight``    -> flattened matmul kernel
* norm/bias/tables                 -> as-is

Assignment mutates ``Param.value`` directly (cheap outside jit) so huge
models never materialize a second copy.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.logger import init_logger


def _is_int8_linear(owner) -> bool:
    # local import: quantization pulls in the logger/env stack, and most
    # loads never touch it
    from fastvideo_tpu.layers.quantization.int8 import Int8Linear

    return isinstance(owner, Int8Linear)
from fastvideo_tpu.models.vaes.autoencoder_kl import Conv2d
from fastvideo_tpu.models.vaes.hunyuan import Conv1x1, HYCausalConv3d
from fastvideo_tpu.models.vaes.ltx2 import LTXCausalConv3d, LTXConv1x1
from fastvideo_tpu.models.vaes.wan import CausalConv3d

logger = init_logger(__name__)


def apply_param_mapping(name: str, mapping: dict[str, str]):
    """Rewrite a checkpoint name through the regex table.

    A mapping value may be ``(replacement, slot, total)`` for fused targets
    (e.g. separate q/k/v checkpoints merged into one qkv kernel, reference
    configs/models/dits/hunyuanvideo.py) — then the return value is
    ``(new_name, slot, total)``.
    """
    for pattern, repl in mapping.items():
        if isinstance(repl, tuple):
            new, n = re.subn(pattern, repl[0], name)
            if n:
                return (new, repl[1], repl[2])
        else:
            new, n = re.subn(pattern, repl, name)
            if n:
                return new
    return name


def _resolve(module, path: list[str]):
    """Walk attribute path; returns (owner_module, leaf_name)."""
    obj = module
    for part in path[:-1]:
        if part.isdigit():
            obj = obj[int(part)]
        else:
            obj = getattr(obj, part)
    return obj, path[-1]


def assign_param(model: nnx.Module, target_name: str, value: np.ndarray,
                 *, dtype: jnp.dtype | None = None,
                 strict: bool = True) -> bool:
    """Assign one checkpoint tensor to the module tree.

    ``target_name`` uses torch conventions (``...weight``/``...bias``); the
    layout conversion is inferred from the owning module type.
    """
    parts = target_name.split(".")
    try:
        owner, leaf = _resolve(model, parts)
    except (AttributeError, IndexError, KeyError):
        msg = f"Checkpoint key {target_name!r} has no matching module"
        if strict:
            raise KeyError(msg) from None
        logger.warning(msg)
        return False

    if isinstance(owner, Conv2d) and leaf == "weight":
        param = owner.weight
        if value.ndim != 4:
            raise ValueError(
                f"Unexpected conv2d weight rank {value.ndim} for "
                f"{target_name}")
        value = value.transpose(2, 3, 1, 0)  # torch OIHW -> HWIO
    elif isinstance(owner, (CausalConv3d, HYCausalConv3d, Conv1x1,
                            LTXCausalConv3d)) and leaf == "weight":
        param = owner.weight
        if value.ndim == 5:
            # torch OIDHW -> DHWIO
            value = value.transpose(2, 3, 4, 1, 0)
        elif value.ndim == 4:
            # torch Conv2d OIHW -> (1)HWIO
            value = value.transpose(2, 3, 1, 0)[None]
        else:
            raise ValueError(
                f"Unexpected conv weight rank {value.ndim} for {target_name}")
    elif _is_int8_linear(owner) and leaf == "weight":
        # quantize-at-load slot: quantize ON HOST, upload int8 + scale
        # (halves the H2D transfer and HBM never holds the bf16 weights)
        from fastvideo_tpu.layers.quantization.int8 import (
            host_quantize_weight_int8)

        if value.ndim == 2:
            value = value.T
        else:
            raise ValueError(
                f"Unexpected int8-linear weight rank {value.ndim} for "
                f"{target_name}")
        wq, scale = host_quantize_weight_int8(value)
        if tuple(owner.kernel_q.value.shape) != tuple(wq.shape):
            raise ValueError(
                f"Shape mismatch for {target_name}: checkpoint {wq.shape} "
                f"vs model {tuple(owner.kernel_q.value.shape)}")
        owner.kernel_q.value = jnp.asarray(wq, jnp.int8)
        owner.scale.value = jnp.asarray(scale, jnp.float32)
        return True
    elif _is_int8_linear(owner) and leaf == "bias":
        param = owner.bias
    elif isinstance(owner, Linear) and leaf == "weight":
        param = owner.kernel
        if value.ndim in (4, 5):
            # ConvNd patchify weight [out, C, *k] -> [C*prod(k), out]
            value = value.reshape(value.shape[0], -1).T
        elif value.ndim == 2:
            value = value.T
        else:
            raise ValueError(
                f"Unexpected linear weight rank {value.ndim} for "
                f"{target_name}")
    elif isinstance(owner, LTXConv1x1) and leaf == "weight":
        param = owner.weight
        if value.ndim == 5:
            # torch 1x1x1 Conv3d [out, in, 1, 1, 1] -> [in, out]
            value = value.reshape(value.shape[0], value.shape[1]).T
        elif value.ndim == 2:
            value = value.T
        else:
            raise ValueError(
                f"Unexpected 1x1 conv weight rank {value.ndim} for "
                f"{target_name}")
    elif isinstance(owner, Linear) and leaf == "bias":
        param = owner.bias
    else:
        param = getattr(owner, leaf, None)

    if not isinstance(param, nnx.Variable):
        msg = f"{target_name!r} resolved to non-parameter {type(param)}"
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
        return False

    if (param.value.ndim != value.ndim
            and param.value.size == value.size):
        # e.g. WanRMS_norm gamma [C,1,1,(1)] -> [C]
        value = value.reshape(param.value.shape)
    if tuple(param.value.shape) != tuple(value.shape):
        raise ValueError(
            f"Shape mismatch for {target_name}: checkpoint {value.shape} vs "
            f"model {tuple(param.value.shape)}")
    target_dtype = dtype if dtype is not None else param.value.dtype
    param.value = jnp.asarray(value, dtype=target_dtype)
    return True


def load_weights(model: nnx.Module,
                 weights: Iterator[tuple[str, np.ndarray]],
                 param_names_mapping: dict[str, str] | None = None,
                 *, dtype: jnp.dtype | None = None,
                 strict: bool = True) -> int:
    count = 0
    pending: dict[str, dict[int, np.ndarray]] = {}
    for name, value in weights:
        target = (apply_param_mapping(name, param_names_mapping)
                  if param_names_mapping else name)
        if isinstance(target, tuple):
            # fused slot: stage until all pieces arrive, then concat along
            # the torch out-dim (dim 0).
            tname, slot, total = target
            pending.setdefault(tname, {})[slot] = value
            if len(pending[tname]) == total:
                merged = np.concatenate(
                    [pending[tname][i] for i in range(total)], axis=0)
                del pending[tname]
                if assign_param(model, tname, merged, dtype=dtype,
                                strict=strict):
                    count += 1
            continue
        if assign_param(model, target, value, dtype=dtype, strict=strict):
            count += 1
    if pending:
        msg = f"Incomplete fused weights: {sorted(pending)}"
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    return count
