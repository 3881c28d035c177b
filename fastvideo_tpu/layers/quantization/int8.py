"""W8A8 int8 linear (TurboDiffusion analog).

Reference: /root/reference/fastvideo-kernel/csrc/turbodiffusion/{gemm,quant}
(INT8 GEMM with per-channel weight scales + dynamic per-token activation
quantization). On TPU this is a single ``lax.dot_general`` over int8 inputs
with int32 accumulation — the MXU runs int8 at 2x bf16 throughput — plus
fused (XLA) quant/dequant elementwise ops; no custom kernel needed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.layers.linear import Linear

Array = jax.Array


@dataclasses.dataclass
class QuantizationConfig:
    method: str = "int8_w8a8"  # or "int8_weight_only"
    # modules whose names contain any of these fragments are skipped
    exclude: tuple[str, ...] = ("embedder", "norm", "proj_out")


def quantize_weight_int8(w: Array) -> tuple[Array, Array]:
    """[in, out] -> (int8 weight, fp32 per-out-channel scale)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127,
                  127).astype(jnp.int8)
    return wq, scale


def _quantize_activation(x: Array) -> tuple[Array, Array]:
    """Dynamic per-token symmetric int8: [..., in] -> (int8, scale[..., 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127,
                  127).astype(jnp.int8)
    return xq, scale


class Int8Linear(nnx.Module):
    """y = dequant(int8(x) @ int8(W)) + b with int32 MXU accumulation."""

    def __init__(self, in_features: int, out_features: int,
                 bias: bool = True, weight_only: bool = False, *,
                 param_dtype: jnp.dtype = jnp.bfloat16, rngs: nnx.Rngs):
        self.in_features = in_features
        self.out_features = out_features
        self.weight_only = weight_only
        self.out_dtype = param_dtype
        self.kernel_q = nnx.Param(
            jnp.zeros((in_features, out_features), jnp.int8))
        self.scale = nnx.Param(jnp.ones((out_features,), jnp.float32))
        self.bias = (nnx.Param(jnp.zeros((out_features,), param_dtype))
                     if bias else None)

    @classmethod
    def from_linear(cls, linear: Linear,
                    weight_only: bool = False) -> "Int8Linear":
        new = cls(linear.in_features, linear.out_features,
                  bias=linear.bias is not None, weight_only=weight_only,
                  param_dtype=linear.kernel.value.dtype, rngs=nnx.Rngs(0))
        wq, scale = quantize_weight_int8(linear.kernel.value)
        # carry the source layer's TP shard metadata: the int8 kernel
        # shards like the bf16 kernel, and the per-output-channel scale
        # like the bias — otherwise quantizing a TP model replicates the
        # weights and GSPMD gathers around every matmul
        tp_axes = getattr(linear.kernel, "tp_axes", None)
        if tp_axes is not None:
            new.kernel_q = nnx.Param(wq, tp_axes=tp_axes)
            new.scale = nnx.Param(scale, tp_axes=(tp_axes[1],))
        else:
            new.kernel_q.value = wq
            new.scale.value = scale
        if linear.bias is not None:
            new.bias = linear.bias
        return new

    def __call__(self, x: Array) -> Array:
        if self.weight_only:
            w = (self.kernel_q.value.astype(jnp.float32) *
                 self.scale.value[None, :]).astype(x.dtype)
            y = jnp.dot(x, w)
        else:
            xq, sx = _quantize_activation(x)
            acc = jax.lax.dot_general(
                xq, self.kernel_q.value,
                (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * sx *
                 self.scale.value).astype(self.out_dtype)
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y


def resolve_quant_method(spec: str) -> str:
    """Normalize a user-facing quant spec to a QuantizationConfig.method.

    Accepted: "int8" / "int8_w8a8" / "w8a8" -> dynamic-activation W8A8;
    "int8-weight-only" / "int8_weight_only" / "w8" -> weight-only.
    """
    s = spec.strip().lower().replace("-", "_")
    if s in ("int8", "int8_w8a8", "w8a8"):
        return "int8_w8a8"
    if s in ("int8_weight_only", "w8", "weight_only"):
        return "int8_weight_only"
    raise ValueError(
        f"Unknown transformer_quant {spec!r}; expected 'int8' or "
        f"'int8-weight-only'")


def quantize_model_linears(model: nnx.Module,
                           config: QuantizationConfig | None = None) -> int:
    """Swap eligible Linear submodules for Int8Linear in place."""
    config = config or QuantizationConfig()
    count = 0

    def walk(mod, path=""):
        nonlocal count
        for name, child in list(vars(mod).items()):
            name = str(name)
            if name.startswith("_"):
                continue
            full = f"{path}.{name}" if path else name
            if isinstance(child, Int8Linear):
                continue
            if isinstance(child, Linear) and not hasattr(child, "lora_A"):
                if any(frag in full for frag in config.exclude):
                    continue
                setattr(mod, name,
                        Int8Linear.from_linear(
                            child,
                            weight_only=config.method ==
                            "int8_weight_only"))
                count += 1
            elif isinstance(child, (nnx.Module, list, nnx.List, dict)):
                if isinstance(child, dict):
                    items = list(child.values())
                elif isinstance(child, (list, nnx.List)):
                    items = list(child)
                else:
                    items = [child]
                for i, item in enumerate(items):
                    if isinstance(item, nnx.Module):
                        sub = full if len(items) == 1 else f"{full}.{i}"
                        walk(item, sub)

    walk(model)
    return count
