"""LoRA linear layers.

Analog of /root/reference/fastvideo/layers/lora (used by
pipelines/lora_pipeline.py:95-460): a Linear augmented with low-rank A/B
deltas, supporting runtime swap, merge and unmerge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.layers.linear import Linear

Array = jax.Array


class LoRALinear(Linear):
    """y = x @ (W + scaling * A @ B) + b.

    A: [in, r], B: [r, out] (torch checkpoints ship lora_A [r, in] /
    lora_B [out, r]; the loader transposes). When ``merged`` the delta is
    folded into the kernel and the A/B path is skipped.
    """

    def __init__(self, in_features: int, out_features: int,
                 bias: bool = True, rank: int = 16, alpha: float | None = None,
                 *, param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        super().__init__(in_features, out_features, bias,
                         param_dtype=param_dtype, rngs=rngs)
        self.rank = rank
        self.alpha = float(alpha if alpha is not None else rank)
        self.lora_A = nnx.Param(jnp.zeros((in_features, rank), param_dtype))
        self.lora_B = nnx.Param(jnp.zeros((rank, out_features), param_dtype))
        self.lora_active = False
        self.merged = False

    @classmethod
    def from_linear(cls, linear: Linear, rank: int = 16,
                    alpha: float | None = None) -> "LoRALinear":
        new = cls(linear.in_features, linear.out_features,
                  bias=linear.bias is not None, rank=rank, alpha=alpha,
                  param_dtype=linear.kernel.value.dtype, rngs=nnx.Rngs(0))
        new.kernel = linear.kernel
        new.bias = linear.bias
        return new

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank

    def set_adapter(self, lora_A, lora_B, alpha: float | None = None) -> None:
        if self.merged:
            self.unmerge()
        dtype = self.kernel.value.dtype
        rank = lora_A.shape[1]
        self.rank = rank
        if alpha is not None:
            self.alpha = float(alpha)
        self.lora_A = nnx.Param(jnp.asarray(lora_A, dtype))
        self.lora_B = nnx.Param(jnp.asarray(lora_B, dtype))
        self.lora_active = True

    def merge(self) -> None:
        if self.merged or not self.lora_active:
            return
        delta = (self.lora_A.value.astype(jnp.float32)
                 @ self.lora_B.value.astype(jnp.float32)) * self.scaling
        self.kernel.value = (self.kernel.value.astype(jnp.float32) +
                             delta).astype(self.kernel.value.dtype)
        self.merged = True

    def unmerge(self) -> None:
        if not self.merged:
            return
        delta = (self.lora_A.value.astype(jnp.float32)
                 @ self.lora_B.value.astype(jnp.float32)) * self.scaling
        self.kernel.value = (self.kernel.value.astype(jnp.float32) -
                             delta).astype(self.kernel.value.dtype)
        self.merged = False

    def __call__(self, x: Array) -> Array:
        y = super().__call__(x)
        if self.lora_active and not self.merged:
            a = self.lora_A.value.astype(x.dtype)
            b = self.lora_B.value.astype(x.dtype)
            y = y + (x @ a) @ b * self.scaling
        return y
