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
    # W8A8 only: skip linears whose OUTPUT feeds an attention kernel
    # (q/k/v and the VSA gate). Measured on-chip (Wan-1.3B VSA step,
    # scripts/exp_int8_local.py): quantizing them is a net LOSS — the
    # dequant epilogue blocks XLA from fusing the projection into the
    # kernel's [b,s,n,d]->[b,n,s,d] relayout, adding a full extra HBM
    # pass per tensor (step 1108 ms bf16 -> 1165 ms int8-attn-only vs
    # 1002 ms with ffn+out-projections only). Weight-only keeps the bf16
    # matmul/epilogue shape, so it is exempt.
    exclude_kernel_feeders: bool = True


# linear names (across model families) whose outputs enter flash/VSA
# Pallas kernels directly
KERNEL_FEEDER_FRAGMENTS = ("to_q", "to_k", "to_v", "q_proj", "k_proj",
                           "v_proj", "qkv", "compress")


def quantize_weight_int8(w: Array) -> tuple[Array, Array]:
    """[in, out] -> (int8 weight, fp32 per-out-channel scale)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127,
                  127).astype(jnp.int8)
    return wq, scale


def host_quantize_weight_int8(
        w: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """numpy mirror of ``quantize_weight_int8``: quantize BEFORE upload.

    Used by the load path for large quantized-at-load components (the
    UMT5-XXL text encoder): the int8 kernel + fp32 scale cross host->HBM
    instead of the bf16 weights, halving both the transfer and the peak
    HBM during load."""
    import numpy as np

    wf = np.asarray(w, np.float32)
    amax = np.max(np.abs(wf), axis=0)
    scale = np.maximum(amax / 127.0, 1e-8).astype(np.float32)
    wq = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
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
    def from_linear(cls, linear: Linear, weight_only: bool = False,
                    init_only: bool = False) -> "Int8Linear":
        """``init_only``: swap the module WITHOUT quantizing the current
        (e.g. random-init) weights — the checkpoint loader assigns
        host-quantized values afterwards (weight_utils.assign_param)."""
        new = cls(linear.in_features, linear.out_features,
                  bias=linear.bias is not None, weight_only=weight_only,
                  param_dtype=linear.kernel.value.dtype, rngs=nnx.Rngs(0))
        if init_only:
            if linear.bias is not None:
                new.bias = linear.bias
            tp_axes = getattr(linear.kernel, "tp_axes", None)
            if tp_axes is not None:
                new.kernel_q = nnx.Param(new.kernel_q.value, tp_axes=tp_axes)
                new.scale = nnx.Param(new.scale.value, tp_axes=(tp_axes[1],))
            return new
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


W8A8_ALIASES = ("int8", "int8_w8a8", "w8a8")
WEIGHT_ONLY_ALIASES = ("int8_weight_only", "w8", "weight_only")


def resolve_quant_method(spec: str) -> str:
    """Normalize a user-facing quant spec to a QuantizationConfig.method.

    Accepted (after lowercasing and ``-``→``_``): any of ``W8A8_ALIASES``
    -> dynamic-activation W8A8; any of ``WEIGHT_ONLY_ALIASES`` -> weight-only.
    """
    s = spec.strip().lower().replace("-", "_")
    if s in W8A8_ALIASES:
        return "int8_w8a8"
    if s in WEIGHT_ONLY_ALIASES:
        return "int8_weight_only"
    raise ValueError(
        f"Unknown transformer_quant {spec!r}; accepted: "
        f"{W8A8_ALIASES + WEIGHT_ONLY_ALIASES}")


def quantize_model_linears(model: nnx.Module,
                           config: QuantizationConfig | None = None,
                           init_only: bool = False) -> int:
    """Swap eligible Linear submodules for Int8Linear in place.

    ``init_only`` swaps module types without quantizing the live values
    (for quantize-at-load: construct -> swap -> stream host-quantized
    checkpoint tensors in)."""
    from fastvideo_tpu.logger import init_logger
    config = config or QuantizationConfig()
    log = init_logger(__name__)
    count = 0

    fragments = tuple(config.exclude)
    if config.method == "int8_w8a8" and config.exclude_kernel_feeders:
        fragments = fragments + KERNEL_FEEDER_FRAGMENTS

    def excluded(full: str) -> bool:
        # match each exclude fragment against whole underscore-delimited
        # words of the dotted-path components ("embedder" excludes
        # "time_embedder", "norm" excludes "norm_out") — not raw
        # substrings, so e.g. a future "denorm" attribute is not
        # silently skipped by "norm". Multi-word fragments ("to_q")
        # match a whole component.
        for comp in full.split("."):
            words = comp.split("_")
            for frag in fragments:
                if frag == comp or frag in words:
                    return True
        return False

    def convert(child: Linear, full: str) -> Int8Linear | None:
        nonlocal count
        if excluded(full):
            log.debug("int8 quantize: skipping excluded %s", full)
            return None
        count += 1
        return Int8Linear.from_linear(
            child, weight_only=config.method == "int8_weight_only",
            init_only=init_only)

    def walk(mod, path=""):
        for name, child in list(vars(mod).items()):
            name = str(name)
            if name.startswith("_"):
                continue
            full = f"{path}.{name}" if path else name
            if isinstance(child, Int8Linear):
                continue
            if isinstance(child, Linear) and not hasattr(child, "lora_A"):
                new = convert(child, full)
                if new is not None:
                    setattr(mod, name, new)
            elif isinstance(child, (nnx.Module, list, nnx.List, dict)):
                if isinstance(child, dict):
                    items = list(child.items())
                elif isinstance(child, (list, nnx.List)):
                    items = list(enumerate(child))
                else:
                    items = [(None, child)]
                for key, item in items:
                    sub = full if key is None else f"{full}.{key}"
                    if (isinstance(item, Linear)
                            and not isinstance(item, Int8Linear)
                            and not hasattr(item, "lora_A")):
                        # a bare Linear held in a container: replace the
                        # container slot directly (setattr on the parent
                        # would miss it)
                        new = convert(item, sub)
                        if new is not None:
                            child[key] = new
                    elif isinstance(item, nnx.Module):
                        walk(item, sub)

    walk(model)
    return count
