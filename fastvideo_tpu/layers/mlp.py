"""MLP block (analog of /root/reference/fastvideo/layers/mlp.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.layers.activation import get_act_fn
from fastvideo_tpu.layers.linear import (ColumnParallelLinear,
                                         RowParallelLinear)

Array = jax.Array


class MLP(nnx.Module):
    """fc_in -> act -> fc_out.

    Field names (``fc_in``/``fc_out``) match the reference so the checkpoint
    ``param_names_mapping`` tables carry over unchanged
    (/root/reference/fastvideo/configs/models/dits/wanvideo.py:20-41).
    """

    def __init__(self, input_dim: int, mlp_hidden_dim: int,
                 output_dim: int | None = None, bias: bool = True,
                 act_type: str = "gelu_pytorch_tanh", *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        output_dim = output_dim or input_dim
        # Megatron column->row pairing: the hidden dim is tp-sharded through
        # the activation; the fc_out contraction emits one psum (inserted by
        # GSPMD). Identical to plain Linears at tp=1.
        self.fc_in = ColumnParallelLinear(input_dim, mlp_hidden_dim, bias,
                                          param_dtype=param_dtype, rngs=rngs)
        self.fc_out = RowParallelLinear(mlp_hidden_dim, output_dim, bias,
                                        param_dtype=param_dtype, rngs=rngs)
        self.act = get_act_fn(act_type)

    def __call__(self, x: Array) -> Array:
        return self.fc_out(self.act(self.fc_in(x)))
