"""Normalization layers.

Numerics mirror /root/reference/fastvideo/layers/layernorm.py: every norm
computes its statistics in float32 regardless of activation dtype (the
reference's FP32LayerNorm / RMSNorm.forward_native), and the AdaLN-style
fused ``norm * (1 + scale) + shift`` helpers keep the modulation math in
float32 before casting back. On TPU the fp32 upcast is free-ish: XLA fuses
the cast into the surrounding elementwise graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

Array = jax.Array


def _layer_norm_fp32(x: Array, eps: float) -> Array:
    """Un-affine layer norm computed in float32; returns float32."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class RMSNorm(nnx.Module):
    """w * x / sqrt(mean(x^2) + eps), stats in fp32 (layernorm.py:13-88)."""

    def __init__(self, hidden_size: int, eps: float = 1e-6,
                 has_weight: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        del rngs  # deterministic init
        self.eps = eps
        self.weight = (nnx.Param(jnp.ones((hidden_size,), param_dtype))
                       if has_weight else None)

    def __call__(self, x: Array) -> Array:
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        # downcast BEFORE the weight multiply — reference RMSNorm
        # (layernorm.py:76-80) order; parity-relevant for bf16 qk norms
        out = xf.astype(orig_dtype)
        if self.weight is not None:
            out = out * self.weight.value.astype(orig_dtype)
        return out


class FP32LayerNorm(nnx.Module):
    """LayerNorm always evaluated in fp32, output cast back (layernorm.py:117)."""

    def __init__(self, hidden_size: int, eps: float = 1e-6,
                 elementwise_affine: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        del rngs
        self.eps = eps
        if elementwise_affine:
            self.weight = nnx.Param(jnp.ones((hidden_size,), param_dtype))
            self.bias = nnx.Param(jnp.zeros((hidden_size,), param_dtype))
        else:
            self.weight = None
            self.bias = None

    def _norm_f32(self, x: Array) -> Array:
        out = _layer_norm_fp32(x, self.eps)
        if self.weight is not None:
            out = out * self.weight.value.astype(jnp.float32)
            out = out + self.bias.value.astype(jnp.float32)
        return out

    def __call__(self, x: Array) -> Array:
        return self._norm_f32(x).astype(x.dtype)


class LayerNormScaleShift(nnx.Module):
    """Fused ``LN(x) * (1 + scale) + shift`` (layernorm.py LayerNormScaleShift).

    Used for the DiT output head; modulation arithmetic stays fp32.
    """

    def __init__(self, hidden_size: int, norm_type: str = "layer",
                 eps: float = 1e-6, elementwise_affine: bool = False, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        if norm_type == "layer":
            self.norm = FP32LayerNorm(hidden_size, eps, elementwise_affine,
                                      param_dtype=param_dtype, rngs=rngs)
        elif norm_type == "rms":
            self.norm = RMSNorm(hidden_size, eps, has_weight=elementwise_affine,
                                param_dtype=param_dtype, rngs=rngs)
        else:
            raise ValueError(f"Unknown norm_type {norm_type}")

    def __call__(self, x: Array, shift: Array, scale: Array) -> Array:
        # shift/scale: [B, 1, C] or [B, S, C] (per-token, Wan2.2 TI2V), fp32.
        if isinstance(self.norm, FP32LayerNorm):
            normed = self.norm._norm_f32(x)
        else:
            # reference parity: the fused RMS branch norms at activation
            # dtype and upcasts after (layernorm.py:251-253)
            normed = self.norm(x).astype(jnp.float32)
        out = normed * (1.0 + scale.astype(jnp.float32)) + shift.astype(
            jnp.float32)
        return out.astype(x.dtype)


class ScaleResidual(nnx.Module):
    """residual + x * gate (layernorm.py ScaleResidual)."""

    def __init__(self, *, rngs: nnx.Rngs | None = None):
        del rngs

    def __call__(self, residual: Array, x: Array, gate: Array) -> Array:
        return residual + (x.astype(jnp.float32) *
                           gate.astype(jnp.float32)).astype(residual.dtype)


class ScaleResidualLayerNormScaleShift(nnx.Module):
    """Fused gated-residual + LN + scale/shift.

    Reference (layernorm.py ScaleResidualLayerNormScaleShift):
      residual_out = residual + x * gate        (fp32)
      normed = LN(residual_out) * (1+scale) + shift   (fp32)
    Returns (normed, residual_out).
    """

    def __init__(self, hidden_size: int, norm_type: str = "layer",
                 eps: float = 1e-6, elementwise_affine: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        # ``.norm`` holds the norm directly (not nested) so checkpoint paths
        # match the reference tree (layernorm.py:150-155).
        if norm_type == "layer":
            self.norm = FP32LayerNorm(hidden_size, eps, elementwise_affine,
                                      param_dtype=param_dtype, rngs=rngs)
        elif norm_type == "rms":
            self.norm = RMSNorm(hidden_size, eps,
                                has_weight=elementwise_affine,
                                param_dtype=param_dtype, rngs=rngs)
        else:
            raise ValueError(f"Unknown norm_type {norm_type}")

    def __call__(self, residual: Array, x: Array, gate: Array, shift: Array,
                 scale: Array) -> tuple[Array, Array]:
        residual_out = (residual.astype(jnp.float32) +
                        x.astype(jnp.float32) * gate.astype(jnp.float32))
        residual_out = residual_out.astype(residual.dtype)
        if isinstance(self.norm, FP32LayerNorm):
            normed = self.norm._norm_f32(residual_out)
        else:
            normed = self.norm(residual_out).astype(jnp.float32)
        normed = (normed * (1.0 + scale.astype(jnp.float32)) +
                  shift.astype(jnp.float32)).astype(residual.dtype)
        return normed, residual_out
