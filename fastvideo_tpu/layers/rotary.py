"""Rotary positional embeddings for (t, h, w) video token grids.

Numerics mirror /root/reference/fastvideo/layers/rotary_embedding.py:
``get_nd_rotary_pos_embed`` builds per-axis 1D tables (freqs =
theta^-(2i/d), positions on an ij meshgrid flattened t-major), expands
cos/sin with repeat_interleave(2) (rotary_embedding.py:335-346), and
concatenates per-axis tables to a full [S, head_dim] pair. Application is
the interleaved rotate-half form used by ``_apply_rotary_emb`` with full
head_dim tables (rotary_embedding.py:127-135):

    out = x * cos + interleave(-x_odd, x_even) * sin   (fp32 math)

Tables are computed in float64 on the host (matching the reference's CUDA
path) then cast to float32 device constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=32)
def get_nd_rotary_pos_embed(
    rope_dim_list: tuple[int, ...],
    rope_sizes: tuple[int, ...],
    theta: float = 10000.0,
    start_frame: int = 0,
    use_f64: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-axis rope tables concatenated to [prod(sizes), sum(dims)].

    Token order is axis-0-major (t, then h, then w), matching the
    patch-embed flatten order (wanvideo.py:721-723).
    """
    dtype = np.float64 if use_f64 else np.float32
    grids = list(
        np.meshgrid(*[np.arange(s, dtype=dtype) for s in rope_sizes],
                    indexing="ij"))
    if start_frame:
        grids[0] = grids[0] + start_frame
    cos_parts, sin_parts = [], []
    for dim, grid in zip(rope_dim_list, grids, strict=True):
        freqs = 1.0 / (theta**(np.arange(0, dim, 2, dtype=dtype)[:dim // 2] /
                               dim))
        angles = np.outer(grid.reshape(-1), freqs)  # [S, dim/2]
        # repeat_interleave(2): [c0, c0, c1, c1, ...] to match the
        # interleaved pairing of rotate-half (rotary_embedding.py:337-345).
        cos_parts.append(np.repeat(np.cos(angles), 2, axis=-1))
        sin_parts.append(np.repeat(np.sin(angles), 2, axis=-1))
    cos = np.concatenate(cos_parts, axis=-1).astype(np.float32)
    sin = np.concatenate(sin_parts, axis=-1).astype(np.float32)
    return cos, sin


def wan_rope_dim_list(head_dim: int) -> tuple[int, int, int]:
    """Wan's (t, h, w) head-dim split (wanvideo.py:710)."""
    d = head_dim
    return (d - 4 * (d // 6), 2 * (d // 6), 2 * (d // 6))


def get_rotary_pos_embed_wan(grid_tHW: tuple[int, int, int], head_dim: int,
                             theta: float = 10000.0,
                             start_frame: int = 0) -> tuple[Array, Array]:
    cos, sin = get_nd_rotary_pos_embed(wan_rope_dim_list(head_dim),
                                       tuple(grid_tHW), theta,
                                       start_frame=start_frame)
    return jnp.asarray(cos), jnp.asarray(sin)


@functools.lru_cache(maxsize=8)
def _rotate_matrix(d: int) -> np.ndarray:
    """[d, d] signed permutation: (x @ R)[2i] = -x[2i+1], [2i+1] = x[2i].

    The interleaved pair shuffle as a matmul. On TPU the stride-2
    even/odd decomposition compiles to sub-lane-hostile T(1,128) reshapes
    plus relayout copies (~7.7 ms/layer measured on the Wan-1.3B step);
    one [*,128]x[128,128] dot rides the MXU instead (~0.03 ms/layer) and
    is BIT-EXACT: every output element is one signed input element (all
    other products are exactly zero), so fp32 accumulation reproduces the
    shuffle's numerics identically.
    """
    r = np.zeros((d, d), np.float32)
    idx = np.arange(0, d, 2)
    r[idx + 1, idx] = -1.0  # out_even = -x_odd
    r[idx, idx + 1] = 1.0  # out_odd  =  x_even
    # numpy on purpose: each jit trace captures it as a constant; caching
    # a device array created under an active trace would leak the tracer
    return r


def apply_rotary_emb(x: Array, cos: Array, sin: Array) -> Array:
    """Interleaved rotate-half rope: x [..., S, H, D], cos/sin [S, D].

    fp32 math with cast back to the input dtype, matching
    ``_apply_rotary_emb`` (rotary_embedding.py:127-135). The pair shuffle
    interleave(-x_odd, x_even) is evaluated as x @ R with a signed
    permutation matrix (see ``_rotate_matrix``) — same values, MXU layout.
    """
    xf = x.astype(jnp.float32)
    x_rot = jax.lax.dot_general(
        xf, _rotate_matrix(x.shape[-1]),
        (((xf.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    cos_b = cos[:, None, :].astype(jnp.float32)
    sin_b = sin[:, None, :].astype(jnp.float32)
    return (xf * cos_b + x_rot * sin_b).astype(x.dtype)
