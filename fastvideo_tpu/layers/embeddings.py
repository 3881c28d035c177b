"""Patch / timestep / modulation embeddings.

Analog of /root/reference/fastvideo/layers/visual_embedding.py. The 3D
patch-embed convolution is expressed as a reshape + matmul rather than a
conv: with kernel_size == stride (non-overlapping patches) they are
mathematically identical, and the matmul form maps straight onto the MXU
without relying on XLA's conv-to-gemm rewrites.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.layers.activation import get_act_fn
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP

Array = jax.Array


class Embedding(nnx.Module):
    """Token/type embedding table; leaf named ``weight`` so torch checkpoint
    keys assign directly (no transpose)."""

    def __init__(self, num_embeddings: int, features: int, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        init = nnx.initializers.normal(1.0)
        self.weight = nnx.Param(
            init(rngs.params(), (num_embeddings, features), param_dtype))

    def __call__(self, ids: Array) -> Array:
        return jnp.take(self.weight.value, ids, axis=0)


class PatchEmbed3D(nnx.Module):
    """[B, C, T, H, W] -> [B, T/pt * H/ph * W/pw, dim] token embedding.

    Equivalent to the reference's ``nn.Conv3d(kernel=stride=patch_size)``
    (visual_embedding.py:13-55). The loader reshapes the conv weight
    ``[dim, C, pt, ph, pw]`` into the ``[C*pt*ph*pw, dim]`` matmul kernel.
    """

    def __init__(self, in_channels: int, embed_dim: int,
                 patch_size: tuple[int, int, int], bias: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        self.patch_size = tuple(patch_size)
        in_features = in_channels * math.prod(self.patch_size)
        self.proj = Linear(in_features, embed_dim, bias,
                           param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        b, c, t, h, w = x.shape
        pt, ph, pw = self.patch_size
        # [B, C, T/pt, pt, H/ph, ph, W/pw, pw]
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        # token order is (t, h, w)-major, feature order (C, pt, ph, pw) to
        # match Conv3d's weight layout contraction.
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        x = x.reshape(b, (t // pt) * (h // ph) * (w // pw), -1)
        return self.proj(x)


def timestep_embedding(t: Array, dim: int, max_period: int = 10000) -> Array:
    """Sinusoidal embedding [cos | sin] (visual_embedding.py:timestep_embedding)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nnx.Module):
    """Sinusoid -> MLP timestep embedding (visual_embedding.py:TimestepEmbedder)."""

    def __init__(self, hidden_size: int, act_layer: str = "silu",
                 frequency_embedding_size: int = 256, max_period: int = 10000,
                 *, param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        self.frequency_embedding_size = frequency_embedding_size
        self.max_period = max_period
        self.mlp = MLP(frequency_embedding_size, hidden_size, hidden_size,
                       act_type=act_layer, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, t: Array,
                 timestep_seq_len: int | None = None) -> Array:
        t_freq = timestep_embedding(t, self.frequency_embedding_size,
                                    self.max_period)
        fc_in = self.mlp.fc_in
        dtype = (fc_in.kernel.value.dtype if hasattr(fc_in, "kernel")
                 else fc_in.out_dtype)  # Int8Linear (quantized serving)
        t_freq = t_freq.astype(dtype)
        if timestep_seq_len is not None:
            t_freq = t_freq.reshape(-1, timestep_seq_len, t_freq.shape[-1])
        return self.mlp(t_freq)


class ModulateProjection(nnx.Module):
    """act -> Linear(dim, dim*factor) (visual_embedding.py:ModulateProjection)."""

    def __init__(self, hidden_size: int, factor: int = 2,
                 act_layer: str = "silu", *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        self.factor = factor
        self.linear = Linear(hidden_size, hidden_size * factor, bias=True,
                             param_dtype=param_dtype, rngs=rngs)
        self.act = get_act_fn(act_layer)

    def __call__(self, x: Array) -> Array:
        return self.linear(self.act(x))


def unpatchify(x: Array, t: int, h: int, w: int,
               patch_size: tuple[int, int, int], channels: int,
               feature_order: str = "pthw_c") -> Array:
    """[B, T*H*W, C*pt*ph*pw] -> [B, C, T*pt, H*ph, W*pw].

    ``feature_order`` is the per-patch feature layout of the projection:
    * "pthw_c": (pt, ph, pw, C) — Wan's output reshape
      (/root/reference/fastvideo/models/dits/wanvideo.py:795-806);
    * "c_pthw": (C, pt, ph, pw) — the shared helper used by HunyuanVideo
      (/root/reference/fastvideo/layers/visual_embedding.py:unpatchify).
    """
    pt, ph, pw = patch_size
    b = x.shape[0]
    if feature_order == "pthw_c":
        x = x.reshape(b, t, h, w, pt, ph, pw, channels)
        # [B, C, t, pt, h, ph, w, pw]
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    else:
        x = x.reshape(b, t, h, w, channels, pt, ph, pw)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(b, channels, t * pt, h * ph, w * pw)
