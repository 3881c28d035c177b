"""Linear layers with tensor-parallel sharding metadata.

TPU-native analog of the reference's vLLM-style TP linears
(/root/reference/fastvideo/layers/linear.py:344,922). On GPU the reference
splits weights manually per rank and calls NCCL all-reduce; on TPU we keep
ONE logical weight and annotate its sharding over the ``tp`` mesh axis —
GSPMD partitions the matmul and inserts the collectives (reduce-scatter /
all-gather) over ICI automatically.

* ``ColumnParallelLinear``: kernel sharded on the output dim -> activations
  come out tp-sharded on features.
* ``RowParallelLinear``: kernel sharded on the input dim -> XLA emits the
  psum that the reference does explicitly via ``tensor_model_parallel_all_reduce``
  (/root/reference/fastvideo/distributed/communication_op.py:17).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.parallel.mesh import TP_AXIS

Array = jax.Array


class Linear(nnx.Module):
    """Plain (replicated) linear: y = x @ kernel + bias.

    Kernel layout is ``[in_features, out_features]`` (JAX convention); the
    checkpoint loader transposes torch's ``[out, in]`` weights.
    """

    kernel_axes: tuple[str | None, str | None] = (None, None)

    def __init__(
        self,
        in_features: int,
        out_features: int,
        bias: bool = True,
        *,
        param_dtype: jnp.dtype = jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.in_features = in_features
        self.out_features = out_features
        init = nnx.initializers.xavier_uniform()
        # NOTE: TP sharding is declared as ``tp_axes`` metadata (consumed by
        # ``fastvideo_tpu.parallel.shard_state``) rather than flax's eager
        # ``sharding=`` kwarg, so modules can be constructed outside a mesh
        # context. The bias lives on the output features, so it inherits the
        # kernel's output-dim axis.
        self.kernel = nnx.Param(
            init(rngs.params(), (in_features, out_features), param_dtype),
            tp_axes=self.kernel_axes)
        if bias:
            self.bias = nnx.Param(jnp.zeros((out_features,), param_dtype),
                                  tp_axes=(self.kernel_axes[1],))
        else:
            self.bias = None

    def __call__(self, x: Array) -> Array:
        kernel = self.kernel.value
        y = jnp.dot(x, kernel.astype(x.dtype))
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y


class ColumnParallelLinear(Linear):
    """Output-dim tp-sharded linear (reference linear.py:344)."""

    kernel_axes = (None, TP_AXIS)


class RowParallelLinear(Linear):
    """Input-dim tp-sharded linear (reference linear.py:922)."""

    kernel_axes = (TP_AXIS, None)


class QKVParallelLinear(ColumnParallelLinear):
    """Fused QKV projection, head-sharded over tp (reference linear.py:674).

    On TPU this is just a column-parallel linear whose output feature dim is
    ``(num_q_heads + 2 * num_kv_heads) * head_dim``; the caller splits.
    """

    def __init__(
        self,
        hidden_size: int,
        head_dim: int,
        num_heads: int,
        num_kv_heads: int | None = None,
        bias: bool = True,
        *,
        param_dtype: jnp.dtype = jnp.float32,
        rngs: nnx.Rngs,
    ):
        num_kv_heads = num_kv_heads or num_heads
        out = (num_heads + 2 * num_kv_heads) * head_dim
        super().__init__(hidden_size, out, bias, param_dtype=param_dtype,
                         rngs=rngs)
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim

    def split_qkv(self, qkv: Array) -> tuple[Array, Array, Array]:
        q_size = self.num_heads * self.head_dim
        kv_size = self.num_kv_heads * self.head_dim
        q = qkv[..., :q_size]
        k = qkv[..., q_size:q_size + kv_size]
        v = qkv[..., q_size + kv_size:]
        return q, k, v
