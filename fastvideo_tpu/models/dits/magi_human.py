"""daVinci-MagiHuman DiT, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/magi_human.py
(:68-864): a flat (video|audio|text) token stream with per-token
modality; sandwich layers (first/last 4) use 3-way modality experts
packed inside each linear ([out*3, in]); GQA with per-head sigmoid
attention gating; GELU7 (first 4 layers) / SwiGLU7 activations with
OpenAI-OSS clamping; element-wise Fourier positional embedding over
9-column coords applied as partial neox RoPE (6*(head_dim//8) rotated
channels); zero-init RMS norms with a +1 offset.

TPU shape: the modality layout is static per generation, so the
dispatcher's permutation and group sizes are host-side numpy — every
per-modality matmul is a static contiguous slice on the MXU; gathers
compile to static permutations.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention import LocalAttention

Array = jax.Array

MAGI_VIDEO, MAGI_AUDIO, MAGI_TEXT = 0, 1, 2


def swiglu7(x: Array, alpha: float = 1.702, limit: float = 7.0) -> Array:
    xf = x.astype(jnp.float32)
    x_glu = jnp.clip(xf[..., ::2], a_max=limit)
    x_lin = jnp.clip(xf[..., 1::2], a_min=-limit, a_max=limit)
    return (x_glu * jax.nn.sigmoid(alpha * x_glu) * (x_lin + 1)).astype(
        x.dtype)


def gelu7(x: Array, alpha: float = 1.702, limit: float = 7.0) -> Array:
    xf = jnp.clip(x.astype(jnp.float32), a_max=limit)
    return (xf * jax.nn.sigmoid(alpha * xf)).astype(x.dtype)


@dataclasses.dataclass
class MagiLayout:
    """Static modality layout (reference ModalityDispatcher :101-131)."""

    permute: np.ndarray
    inv_permute: np.ndarray
    group_sizes: tuple[int, int, int]
    video_mask: np.ndarray
    audio_mask: np.ndarray
    text_mask: np.ndarray

    @classmethod
    def build(cls, modality_mapping: np.ndarray) -> "MagiLayout":
        m = np.asarray(modality_mapping)
        # stable argsort matches torch.argsort on the grouped layout
        perm = np.argsort(m, kind="stable")
        inv = np.argsort(perm, kind="stable")
        sizes = tuple(int((m == i).sum()) for i in range(3))
        return cls(perm, inv, sizes, m == MAGI_VIDEO, m == MAGI_AUDIO,
                   m == MAGI_TEXT)

    def dispatch(self, x: Array) -> list[Array]:
        s0, s1, _ = self.group_sizes
        return [x[:s0], x[s0:s0 + s1], x[s0 + s1:]]


class MultiModalityRMSNorm(nnx.Module):
    """Zero-init RMS norm with +1 offset; per-modality scales when
    num_modality > 1 (reference :139-177)."""

    def __init__(self, dim: int, eps: float = 1e-6, num_modality: int = 1, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs | None = None):
        del rngs
        self.dim = dim
        self.eps = eps
        self.num_modality = num_modality
        self.weight = nnx.Param(jnp.zeros((dim * num_modality,),
                                          jnp.float32))

    def _rms(self, x: Array) -> Array:
        t = x.astype(jnp.float32)
        return t * jax.lax.rsqrt(jnp.mean(t * t, -1, keepdims=True) +
                                 self.eps)

    def __call__(self, x: Array, layout: MagiLayout | None = None) -> Array:
        t = self._rms(x)
        if self.num_modality == 1:
            return (t * (self.weight.value + 1.0)).astype(x.dtype)
        w = jnp.split(self.weight.value, self.num_modality)
        parts = layout.dispatch(t)
        parts = [p * (wc + 1.0) for p, wc in zip(parts, w)]
        return jnp.concatenate(parts, axis=0).astype(x.dtype)


def fourier_rope(coords: np.ndarray, head_dim: int,
                 temperature: float = 10000.0) -> np.ndarray:
    """[L, 9] -> [L, 6*(head_dim//8)] (reference :180-221), host-side."""
    bands = 1.0 / (temperature**(np.arange(head_dim // 8, dtype=np.float64) /
                                 (head_dim // 8)))
    coords = np.asarray(coords, np.float64)
    xyz = coords[:, :3].copy()
    sizes = coords[:, 3:6]
    refs = coords[:, 6:9]
    scales = np.where((refs == 1) & (sizes == 1), 1.0,
                      (refs - 1) / np.maximum(sizes - 1, 1e-9))
    centers = (sizes - 1) / 2
    centers[:, 0] = 0
    xyz = xyz - centers
    proj = xyz[..., None] * scales[..., None] * bands  # [L, 3, B]
    out = np.concatenate([np.sin(proj), np.cos(proj)], axis=1)
    return out.reshape(coords.shape[0], -1).astype(np.float32)


def _apply_partial_neox(x: Array, cos: Array, sin: Array) -> Array:
    """x [L, H, D]; cos/sin [L, rot/2]; rotate leading channels."""
    rot = cos.shape[-1] * 2
    xf = x[..., :rot].astype(jnp.float32)
    first, second = jnp.split(xf, 2, axis=-1)
    cos_b = cos[:, None].astype(jnp.float32)
    sin_b = sin[:, None].astype(jnp.float32)
    rotated = jnp.concatenate(
        [first * cos_b - second * sin_b, second * cos_b + first * sin_b],
        -1).astype(x.dtype)
    return jnp.concatenate([rotated, x[..., rot:]], -1)


class PackedExpertLinear(nnx.Module):
    """weight [out*experts, in] torch layout (reference :229-289)."""

    def __init__(self, in_features: int, out_features: int,
                 num_experts: int = 1, bias: bool = False, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.num_experts = num_experts
        self.out_features = out_features
        self.weight = nnx.Param(
            init(rngs.params(), (out_features * num_experts, in_features),
                 param_dtype))
        self.bias = (nnx.Param(
            jnp.zeros((out_features * num_experts,), param_dtype))
                     if bias else None)

    def __call__(self, x: Array, layout: MagiLayout | None = None) -> Array:
        w = self.weight.value.astype(x.dtype)
        if self.num_experts == 1:
            out = x @ w.T
            if self.bias is not None:
                out = out + self.bias.value.astype(x.dtype)
            return out
        parts = layout.dispatch(x)
        w_chunks = jnp.split(w, self.num_experts, axis=0)
        b_chunks = (jnp.split(self.bias.value, self.num_experts)
                    if self.bias is not None else [None] * self.num_experts)
        outs = []
        for p, wc, bc in zip(parts, w_chunks, b_chunks):
            o = p @ wc.T
            if bc is not None:
                o = o + bc.astype(x.dtype)
            outs.append(o)
        return jnp.concatenate(outs, axis=0)


class MagiAttention(nnx.Module):
    """GQA + per-head sigmoid gating (reference :309-517)."""

    def __init__(self, hidden_size: int, num_heads_q: int, num_heads_kv: int,
                 head_dim: int, num_modality: int, enable_gating: bool,
                 use_local_attn: bool = False,
                 frame_receptive_field: int = 11, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads_q = num_heads_q
        self.num_heads_kv = num_heads_kv
        self.head_dim = head_dim
        self.gating_size = num_heads_q if enable_gating else 0
        self.use_local_attn = use_local_attn
        self.frame_receptive_field = frame_receptive_field
        qkv_out = (num_heads_q + 2 * num_heads_kv) * head_dim + \
            self.gating_size
        self.pre_norm = MultiModalityRMSNorm(hidden_size,
                                             num_modality=num_modality)
        self.linear_qkv = PackedExpertLinear(hidden_size, qkv_out,
                                             num_modality, **kw)
        self.linear_proj = PackedExpertLinear(num_heads_q * head_dim,
                                              hidden_size, num_modality,
                                              **kw)
        self.q_norm = MultiModalityRMSNorm(head_dim,
                                           num_modality=num_modality)
        self.k_norm = MultiModalityRMSNorm(head_dim,
                                           num_modality=num_modality)
        self.attn = LocalAttention(num_heads_q, head_dim)

    def _full_attn(self, q: Array, k: Array, v: Array) -> Array:
        if self.num_heads_kv != self.num_heads_q:
            rep = self.num_heads_q // self.num_heads_kv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        return self.attn(q[None], k[None], v[None])[0]

    def _local_window(self, q: Array, k: Array, v: Array,
                      num_video_tokens: int, num_frames: int) -> Array:
        """(reference :367-434): summed independently-normalized
        contributions — local-window video + video->audio/text + full
        audio/text rows."""
        if num_frames <= 0 or num_video_tokens <= 0:
            return self._full_attn(q, k, v)
        tpf = num_video_tokens // num_frames
        rf = int(self.frame_receptive_field)
        rows = []
        for fi in range(num_frames):
            qs, qe = fi * tpf, (fi + 1) * tpf
            ks = max(0, (fi - rf) * tpf)
            ke = min(num_video_tokens, (fi + rf + 1) * tpf)
            rows.append(self._full_attn(q[qs:qe], k[ks:ke], v[ks:ke]))
        out_video = jnp.concatenate(rows, axis=0)
        if num_video_tokens < q.shape[0]:
            out_video = out_video + self._full_attn(
                q[:num_video_tokens], k[num_video_tokens:],
                v[num_video_tokens:])
            out_at = self._full_attn(q[num_video_tokens:], k, v)
            return jnp.concatenate([out_video, out_at], axis=0)
        return out_video

    def __call__(self, x: Array, rope: Array, layout: MagiLayout,
                 num_video_tokens: int = 0, num_frames: int = 0) -> Array:
        h = self.pre_norm(x, layout).astype(x.dtype)
        qkv = self.linear_qkv(h, layout).astype(jnp.float32)
        q_size = self.num_heads_q * self.head_dim
        kv_size = self.num_heads_kv * self.head_dim
        q = qkv[:, :q_size].reshape(-1, self.num_heads_q, self.head_dim)
        k = qkv[:, q_size:q_size + kv_size].reshape(-1, self.num_heads_kv,
                                                    self.head_dim)
        v = qkv[:, q_size + kv_size:q_size + 2 * kv_size].reshape(
            -1, self.num_heads_kv, self.head_dim)
        g = (qkv[:, -self.gating_size:].reshape(-1, self.num_heads_q, 1)
             if self.gating_size else None)

        q = self.q_norm(q, layout)
        k = self.k_norm(k, layout)

        inv = jnp.asarray(layout.inv_permute)
        q, k, v = q[inv], k[inv], v[inv]
        if g is not None:
            g = g[inv]

        # rope holds [sin | cos] halves (reference :475)
        sin_emb, cos_emb = jnp.split(jnp.asarray(rope), 2, axis=-1)
        q = _apply_partial_neox(q, cos_emb, sin_emb)
        k = _apply_partial_neox(k, cos_emb, sin_emb)

        q, k, v = (t.astype(x.dtype) for t in (q, k, v))
        if self.use_local_attn:
            out = self._local_window(q, k, v, num_video_tokens, num_frames)
        else:
            out = self._full_attn(q, k, v)
        perm = jnp.asarray(layout.permute)
        out = out[perm]
        if g is not None:
            out = (out.astype(jnp.float32) *
                   jax.nn.sigmoid(g[perm].astype(jnp.float32)))
        out = out.reshape(-1, self.num_heads_q * self.head_dim).astype(
            x.dtype)
        return self.linear_proj(out, layout)


class MagiMLP(nnx.Module):
    def __init__(self, hidden_size: int, intermediate_size: int,
                 activation: str, num_modality: int, gated: bool, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.pre_norm = MultiModalityRMSNorm(hidden_size,
                                             num_modality=num_modality)
        up_out = intermediate_size * 2 if gated else intermediate_size
        self.up_gate_proj = PackedExpertLinear(hidden_size, up_out,
                                               num_modality, **kw)
        self.down_proj = PackedExpertLinear(intermediate_size, hidden_size,
                                            num_modality, **kw)
        self._act = swiglu7 if activation == "swiglu7" else gelu7

    def __call__(self, x: Array, layout: MagiLayout) -> Array:
        h = self.pre_norm(x, layout).astype(x.dtype)
        h = self.up_gate_proj(h, layout).astype(jnp.float32)
        h = self._act(h).astype(x.dtype)
        return self.down_proj(h, layout).astype(jnp.float32)


class MagiTransformerLayer(nnx.Module):
    def __init__(self, arch, layer_idx: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        num_modality = 3 if layer_idx in arch.mm_layers else 1
        self.post_norm = layer_idx in arch.post_norm_layers
        self.attention = MagiAttention(
            arch.hidden_size, arch.num_attention_heads, arch.num_heads_kv,
            arch.head_dim, num_modality, arch.enable_attn_gating,
            use_local_attn=layer_idx in arch.local_attn_layers,
            frame_receptive_field=getattr(arch, "frame_receptive_field", 11),
            **kw)
        if layer_idx in arch.gelu7_layers:
            intermediate, gated, act = arch.hidden_size * 4, False, "gelu7"
        else:
            intermediate = (arch.hidden_size * 4 * 2 // 3) // 4 * 4
            gated, act = True, "swiglu7"
        self.mlp = MagiMLP(arch.hidden_size, intermediate, act,
                           num_modality, gated, **kw)
        if self.post_norm:
            self.attn_post_norm = MultiModalityRMSNorm(
                arch.hidden_size, num_modality=num_modality)
            self.mlp_post_norm = MultiModalityRMSNorm(
                arch.hidden_size, num_modality=num_modality)

    def __call__(self, x: Array, rope: Array, layout: MagiLayout,
                 num_video_tokens: int, num_frames: int) -> Array:
        attn_out = self.attention(x.astype(jnp.float32), rope, layout,
                                  num_video_tokens, num_frames)
        if self.post_norm:
            attn_out = self.attn_post_norm(attn_out, layout)
        x = x + attn_out.astype(jnp.float32)
        mlp_out = self.mlp(x.astype(jnp.float32), layout)
        if self.post_norm:
            mlp_out = self.mlp_post_norm(mlp_out, layout)
        return x + mlp_out.astype(jnp.float32)


class _Linear(nnx.Module):
    """torch-layout [out, in] linear (fp32 embedders/heads)."""

    def __init__(self, in_features: int, out_features: int,
                 bias: bool = True, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.weight = nnx.Param(
            init(rngs.params(), (out_features, in_features), param_dtype))
        self.bias = nnx.Param(jnp.zeros(
            (out_features,), param_dtype)) if bias else None

    def __call__(self, x: Array) -> Array:
        out = x @ self.weight.value.astype(x.dtype).T
        if self.bias is not None:
            out = out + self.bias.value.astype(x.dtype)
        return out


class MagiAdapter(nnx.Module):
    """Per-modality embedders (reference :626-681)."""

    def __init__(self, arch, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=jnp.float32, rngs=rngs)
        self.video_embedder = _Linear(arch.video_in_channels,
                                      arch.hidden_size, **kw)
        self.text_embedder = _Linear(arch.text_in_channels,
                                     arch.hidden_size, **kw)
        self.audio_embedder = _Linear(arch.audio_in_channels,
                                      arch.hidden_size, **kw)
        self.head_dim = arch.head_dim

    def __call__(self, x: Array, coords: np.ndarray, layout: MagiLayout):
        rope = jnp.asarray(fourier_rope(np.asarray(coords), self.head_dim))
        vm = jnp.asarray(layout.video_mask)[:, None]
        am = jnp.asarray(layout.audio_mask)[:, None]
        tm = jnp.asarray(layout.text_mask)[:, None]
        v_in = self.video_embedder.weight.value.shape[1]
        a_in = self.audio_embedder.weight.value.shape[1]
        t_in = self.text_embedder.weight.value.shape[1]
        xf = x.astype(jnp.float32)
        out = (vm * self.video_embedder(xf[:, :v_in]) +
               am * self.audio_embedder(xf[:, :a_in]) +
               tm * self.text_embedder(xf[:, :t_in]))
        return out, rope


class MagiHumanDiT(nnx.Module):
    """(reference :738-864)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        arch = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.adapter = MagiAdapter(arch, **kw)
        self.layers = nnx.List([
            MagiTransformerLayer(arch, i, **kw)
            for i in range(arch.num_layers)
        ])
        self.final_norm_video = MultiModalityRMSNorm(arch.hidden_size)
        self.final_norm_audio = MultiModalityRMSNorm(arch.hidden_size)
        self.final_linear_video = _Linear(arch.hidden_size,
                                          arch.video_in_channels, bias=False,
                                          rngs=rngs)
        self.final_linear_audio = _Linear(arch.hidden_size,
                                          arch.audio_in_channels, bias=False,
                                          rngs=rngs)

    def __call__(self, x: Array, coords_mapping, modality_mapping,
                 **kwargs) -> Array:
        """x [L, max_ch]; coords [L, 9]; modality_mapping [L] host ints."""
        arch = self.config
        modality = np.asarray(modality_mapping)
        coords = np.asarray(coords_mapping)
        layout = MagiLayout.build(modality)
        num_video_tokens = int(layout.video_mask.sum())
        num_frames = (int(coords[:num_video_tokens, 0].max()) + 1
                      if num_video_tokens else 0)

        h, rope = self.adapter(x, coords, layout)
        perm = jnp.asarray(layout.permute)
        h = h[perm]
        for layer in self.layers:
            h = layer(h, rope, layout, num_video_tokens, num_frames)
        inv = jnp.asarray(layout.inv_permute)
        h = h[inv]

        vm = jnp.asarray(layout.video_mask)[:, None]
        am = jnp.asarray(layout.audio_mask)[:, None]
        x_video = self.final_linear_video(
            self.final_norm_video(h.astype(jnp.float32)))
        x_audio = self.final_linear_audio(
            self.final_norm_audio(h.astype(jnp.float32)))
        max_ch = max(arch.video_in_channels, arch.audio_in_channels)

        def pad_ch(t):
            return jnp.pad(t, ((0, 0), (0, max_ch - t.shape[-1])))

        return vm * pad_ch(x_video) + am * pad_ch(x_audio)


EntryClass = MagiHumanDiT
