"""Ulysses-style sequence parallelism on a TPU mesh.

Reference semantics: DiTs shard tokens on the sequence dim after patch-embed
(/root/reference/fastvideo/models/dits/wanvideo.py:725), attention does
all-to-all(scatter heads, gather seq) -> full-seq attention on a head shard ->
reverse all-to-all (/root/reference/fastvideo/attention/layer.py:122,162),
with pad-aware shard/unpad helpers
(/root/reference/fastvideo/distributed/communication_op.py:40-93).

TPU-native design: the model body runs under GSPMD with activations
constrained to ``P(dp, sp, ...)`` on the token dim; the attention exchange is
an explicit ``shard_map`` region whose ``jax.lax.all_to_all`` lowers onto ICI.
No communicator objects, no NCCL: XLA owns the collectives.
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fastvideo_tpu.parallel.mesh import (DP_AXIS, SP_AXIS, TP_AXIS, get_mesh,
                                         get_sp_size, get_tp_size)

Array = jax.Array


def pad_to_multiple(x: Array, multiple: int, axis: int) -> tuple[Array, int]:
    """Zero-pad ``axis`` of ``x`` up to a multiple; returns (padded, orig)."""
    size = x.shape[axis]
    if multiple <= 1 or size % multiple == 0:
        return x, size
    pad = multiple - size % multiple
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


def pad_rope_to(cos: Array, sin: Array,
                seq_len: int) -> tuple[Array, Array]:
    """Pad [S, D] rope tables to the (sp-padded) token length: cos with
    1.0 / sin with 0.0 so padded tokens rotate by identity. Every model
    that shard_seq()s its tokens must apply this (the pad tokens are
    masked out of attention via kv_valid, but the rope multiply still
    needs matching shapes)."""
    if cos.shape[0] != seq_len:
        pad = seq_len - cos.shape[0]
        cos = jnp.pad(cos, ((0, pad), (0, 0)), constant_values=1.0)
        sin = jnp.pad(sin, ((0, pad), (0, 0)))
    return cos, sin


def pad_tokens_to(t: Array | None, seq_len: int,
                  axis: int = 1) -> Array | None:
    """Zero-pad a per-token tensor (modulation, temb, masks) on its token
    axis to the (sp-padded) length."""
    if t is None or t.shape[axis] == seq_len:
        return t
    widths = [(0, 0)] * t.ndim
    widths[axis] = (0, seq_len - t.shape[axis])
    return jnp.pad(t, widths)


def shard_seq(x: Array, axis: int = 1) -> tuple[Array, int]:
    """Pad the token dim to a multiple of sp and constrain it to the sp axis.

    Mirrors ``sequence_model_parallel_shard``
    (/root/reference/fastvideo/distributed/communication_op.py:64) but as a
    sharding constraint: XLA materializes only the local shard per device.
    Returns (sharded tensor, original sequence length).
    """
    sp = get_sp_size()
    x, orig = pad_to_multiple(x, sp, axis)
    if sp > 1:
        spec = [None] * x.ndim
        spec[0] = DP_AXIS
        spec[axis] = SP_AXIS
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(get_mesh(), P(*spec)))
    return x, orig


def unshard_seq(x: Array, original_len: int, axis: int = 1) -> Array:
    """All-gather the token dim and strip padding.

    Mirrors ``sequence_model_parallel_all_gather_with_unpad``
    (/root/reference/fastvideo/distributed/communication_op.py:40).
    """
    sp = get_sp_size()
    if sp > 1:
        spec = [None] * x.ndim
        spec[0] = DP_AXIS
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(get_mesh(), P(*spec)))
    if x.shape[axis] != original_len:
        x = jax.lax.slice_in_dim(x, 0, original_len, axis=axis)
    return x


def ulysses_attention(
    local_attn: Callable[..., Array],
    q: Array,
    k: Array,
    v: Array,
    *,
    kv_replicated: bool = False,
    extra: Array | None = None,
) -> Array:
    """Run full-sequence attention over seq-sharded q/k/v.

    Args:
      local_attn: per-device attention callable ``(q, k, v) -> o`` operating
        on ``[B, S, H, D]`` tensors (full sequence, local heads).
      q, k, v: ``[B, S_local*sp, H, D]`` logically; sharded ``P(dp, sp)`` on
        (batch, seq). When ``kv_replicated`` is True, k/v carry a replicated
        context (cross-attention) and no exchange is needed for them.

    The head exchange is the Ulysses all-to-all of the reference
    (/root/reference/fastvideo/attention/layer.py:122): scatter heads,
    gather sequence; reversed on the output.
    """
    mesh = get_mesh()
    sp = mesh.shape[SP_AXIS]
    tp = mesh.shape[TP_AXIS]
    if sp == 1 and tp == 1:
        if extra is not None:
            return local_attn(q, k, v, extra)
        return local_attn(q, k, v)
    if q.shape[2] % (sp * tp) != 0:
        raise ValueError(
            f"num_heads={q.shape[2]} must be divisible by sp*tp={sp * tp}")

    def a2a_heads(x: Array) -> Array:
        # [B, S/sp, H, D] local -> [B, S, H/sp, D] local.
        return jax.lax.all_to_all(x, SP_AXIS, split_axis=2, concat_axis=1,
                                  tiled=True)

    def a2a_seq(x: Array) -> Array:
        # [B, S, H/sp, D] local -> [B, S/sp, H, D] local.
        return jax.lax.all_to_all(x, SP_AXIS, split_axis=1, concat_axis=2,
                                  tiled=True)

    def inner(q: Array, k: Array, v: Array, *maybe_extra) -> Array:
        q = a2a_heads(q)
        if kv_replicated:
            # Context is replicated across sp: take this rank's head shard.
            heads_per = k.shape[2] // sp
            idx = jax.lax.axis_index(SP_AXIS)
            k_l = jax.lax.dynamic_slice_in_dim(k, idx * heads_per, heads_per,
                                               axis=2)
            v_l = jax.lax.dynamic_slice_in_dim(v, idx * heads_per, heads_per,
                                               axis=2)
        else:
            k_l = a2a_heads(k)
            v_l = a2a_heads(v)
        if maybe_extra:
            g = a2a_heads(maybe_extra[0])
            o = local_attn(q, k_l, v_l, g)
        else:
            o = local_attn(q, k_l, v_l)
        return a2a_seq(o)

    # Heads carry the tp axis (Megatron column-parallel projections emit
    # head-sharded q/k/v); sp exchanges seq<->heads within each tp shard.
    q_spec = P(DP_AXIS, SP_AXIS, TP_AXIS)
    kv_spec = (P(DP_AXIS, None, TP_AXIS) if kv_replicated else q_spec)
    operands = (q, k, v) if extra is None else (q, k, v, extra)
    in_specs = (q_spec, kv_spec, kv_spec)
    if extra is not None:
        in_specs = (*in_specs, q_spec)
    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=q_spec,
        check_vma=False,
    )(*operands)


def local_head_parallel_attention(
    local_attn: Callable[..., Array],
    q: Array,
    k: Array,
    v: Array,
    *,
    q_seq_sharded: bool | None = None,
) -> Array:
    """Head-parallel (tp) attention with NO seq exchange (cross-attention).

    Each device attends its local q tokens (optionally sp-sharded) over the
    full, sp-replicated k/v context, using only its tp head shard. This keeps
    Pallas kernels on local shards — GSPMD cannot partition custom calls, so
    without the shard_map a tp-sharded head dim would be all-gathered.
    """
    mesh = get_mesh()
    tp = mesh.shape[TP_AXIS]
    if tp == 1:
        return local_attn(q, k, v)
    if q.shape[2] % tp != 0:
        raise ValueError(f"num_heads={q.shape[2]} must divide tp={tp}")
    if q_seq_sharded is None:
        q_seq_sharded = mesh.shape[SP_AXIS] > 1
    q_spec = P(DP_AXIS, SP_AXIS if q_seq_sharded else None, TP_AXIS)
    kv_spec = P(DP_AXIS, None, TP_AXIS)
    return jax.shard_map(
        local_attn, mesh=mesh, in_specs=(q_spec, kv_spec, kv_spec),
        out_specs=q_spec, check_vma=False)(q, k, v)
