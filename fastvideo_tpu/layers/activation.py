"""Activation registry (analog of /root/reference/fastvideo/layers/activation.py)."""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def gelu_tanh(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=True)


def gelu(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=False)


_ACT_FNS: dict[str, Callable[[Array], Array]] = {
    "gelu": gelu,
    "gelu_new": gelu_tanh,
    "gelu_pytorch_tanh": gelu_tanh,
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}


def get_act_fn(name: str) -> Callable[[Array], Array]:
    try:
        return _ACT_FNS[name]
    except KeyError:
        raise ValueError(f"Unsupported activation: {name!r}. "
                         f"Known: {sorted(_ACT_FNS)}") from None
