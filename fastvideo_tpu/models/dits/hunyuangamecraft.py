"""HunyuanGameCraft DiT: HunyuanVideo MM-DiT + CameraNet action conditioning.

Behavioral reference: /root/reference/fastvideo/models/dits/
hunyuangamecraft.py (:31-363): the HunyuanVideo double/single-stream
trunk with (a) a CameraNet that pixel-unshuffles Plücker-coordinate
camera states, refines them through two 1x1-conv + GroupNorm + ReLU
stages with first-frame-preserving temporal pooling, patchifies, and
adds them to the image tokens; and (b) a final layer whose modulation is
(shift, scale)-ordered — opposite to HunyuanVideo's. No embedded
guidance. TPU shape: channels-last throughout the CameraNet, 1x1 convs
as matmuls on the MXU, temporal pooling as reshape-mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.dits.hunyuangamecraft import (
    HunyuanGameCraftArchConfig)
from fastvideo_tpu.layers.embeddings import (ModulateProjection, PatchEmbed3D,
                                             unpatchify)
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import FP32LayerNorm
from fastvideo_tpu.layers.rotary import get_nd_rotary_pos_embed
from fastvideo_tpu.models.dits.hunyuan import (HunyuanVideoTransformer3DModel)
from fastvideo_tpu.models.vaes.hunyuan import GroupNorm
from fastvideo_tpu.parallel import shard_seq, unshard_seq

Array = jax.Array


class GameCraftFinalLayer(nnx.Module):
    """Output AdaLN with (shift, scale) modulation order (reference
    hunyuangamecraft.py:31-72; HunyuanVideo's FinalLayer is swapped)."""

    def __init__(self, hidden_size: int, patch_size: tuple[int, int, int],
                 out_channels: int, *, param_dtype: jnp.dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm_final = FP32LayerNorm(hidden_size, 1e-6, False, **kw)
        out_dim = patch_size[0] * patch_size[1] * patch_size[2] * out_channels
        self.linear = Linear(hidden_size, out_dim, **kw)
        self.adaLN_modulation = ModulateProjection(hidden_size, factor=2,
                                                   act_layer="silu", **kw)

    def __call__(self, x: Array, c: Array) -> Array:
        shift, scale = jnp.split(self.adaLN_modulation(c), 2, axis=-1)
        x = self.norm_final(x) * (1.0 + scale[:, None]) + shift[:, None]
        return self.linear(x)


class CameraNet(nnx.Module):
    """Plücker camera-state encoder (reference hunyuangamecraft.py:75-178).

    pixel-unshuffle(r) -> [1x1 conv + GroupNorm(2) + ReLU] -> temporal
    pool -> [1x1 conv + GroupNorm(2) + ReLU] -> temporal pool -> 1x1
    proj -> 3D patchify -> * scale. Channels-last; the 1x1 convs are
    plain matmuls.
    """

    def __init__(self, in_channels: int, downscale_coef: int,
                 out_channels: int, patch_size: tuple[int, int, int],
                 hidden_size: int, *, param_dtype: jnp.dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.downscale_coef = downscale_coef
        start = in_channels * downscale_coef**2
        chans = (start, start // 2, start // 4)
        self.encode_first_conv = Linear(chans[0], chans[1], **kw)
        self.encode_first_norm = GroupNorm(2, chans[1], eps=1e-5, **kw)
        self.encode_second_conv = Linear(chans[1], chans[2], **kw)
        self.encode_second_norm = GroupNorm(2, chans[2], eps=1e-5, **kw)
        self.final_proj = Linear(chans[2], out_channels, **kw)
        # reference zero-inits final_proj so camera conditioning starts off
        self.final_proj.kernel.value = jnp.zeros_like(
            self.final_proj.kernel.value)
        self.scale = nnx.Param(jnp.ones((1,), param_dtype))
        self.camera_in = PatchEmbed3D(out_channels, hidden_size, patch_size,
                                      **kw)

    def _pixel_unshuffle(self, x: Array) -> Array:
        """[N, H, W, C] -> [N, H/r, W/r, C*r*r]; channel order (c, i, j)
        matching torch.nn.PixelUnshuffle on NCHW."""
        n, h, w, c = x.shape
        r = self.downscale_coef
        x = x.reshape(n, h // r, r, w // r, r, c)
        x = x.transpose(0, 1, 3, 5, 2, 4)
        return x.reshape(n, h // r, w // r, c * r * r)

    @staticmethod
    def _pool_keep_first(x: Array) -> Array:
        """avg-pool pairs over axis 1 keeping the first element; trailing
        odd element dropped (torch avg_pool1d floor semantics)."""
        first = x[:, :1]
        rest = x[:, 1:]
        n = rest.shape[1] // 2
        if n > 0:
            rest = rest[:, :n * 2].reshape(x.shape[0], n, 2,
                                           *x.shape[2:]).mean(axis=2)
            return jnp.concatenate([first, rest], axis=1)
        return first

    def _compress_time(self, x: Array, batch: int) -> Array:
        """(reference compress_time :140-164): first-frame-preserving
        temporal pooling with multi-clip (66/34-frame) special cases."""
        nf = x.shape[0] // batch
        h, w, c = x.shape[1:]
        x = x.reshape(batch, nf, h, w, c)
        if nf in (66, 34):
            half = nf // 2
            x = jnp.concatenate([
                self._pool_keep_first(x[:, :half]),
                self._pool_keep_first(x[:, half:]),
            ], axis=1)
        elif nf % 2 == 1:
            x = self._pool_keep_first(x)
        else:
            x = x.reshape(batch, nf // 2, 2, h, w, c).mean(axis=2)
        return x.reshape(-1, h, w, c)

    def __call__(self, camera_states: Array) -> Array:
        """[B, F, 6, H, W] -> [B, S, hidden] token embeddings."""
        b, f, c, h, w = camera_states.shape
        x = camera_states.reshape(b * f, c, h, w).transpose(0, 2, 3, 1)
        x = self._pixel_unshuffle(x)
        x = jax.nn.relu(self.encode_first_norm(self.encode_first_conv(x)))
        x = self._compress_time(x, b)
        x = jax.nn.relu(self.encode_second_norm(self.encode_second_conv(x)))
        x = self._compress_time(x, b)
        x = self.final_proj(x)
        nf = x.shape[0] // b
        x = x.reshape(b, nf, *x.shape[1:]).transpose(0, 4, 1, 2, 3)  # NCDHW
        return self.camera_in(x) * self.scale.value.astype(x.dtype)


class HunyuanGameCraftTransformer3DModel(HunyuanVideoTransformer3DModel):
    """GameCraft trunk (reference hunyuangamecraft.py:181-363)."""

    def __init__(self, config: HunyuanGameCraftArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(config, param_dtype=param_dtype, rngs=rngs)
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        hidden = config.hidden_size
        # GameCraft's (shift, scale) final layer replaces Hunyuan's
        self.final_layer = GameCraftFinalLayer(hidden, config.patch_size_thw,
                                               self.out_channels, **kw)
        self.camera_net = CameraNet(config.camera_in_channels,
                                    config.camera_downscale_coef,
                                    config.camera_out_channels,
                                    config.patch_size_thw, hidden, **kw)

    def _camera_latents(self, camera_states: Array, latent_len: int) -> Array:
        """Multi-clip autoregressive layouts (reference :319-334): 18
        latent frames = [zero-camera clip | camera clip]; 10 = short
        zero prefix + camera clip; otherwise one clip."""
        if latent_len == 18:
            return jnp.concatenate([
                self.camera_net(jnp.zeros_like(camera_states)),
                self.camera_net(camera_states)
            ], axis=1)
        if latent_len == 10:
            return jnp.concatenate([
                self.camera_net(jnp.zeros_like(camera_states[:, 0:4])),
                self.camera_net(camera_states)
            ], axis=1)
        return self.camera_net(camera_states)

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array, camera_states: Array | None = None,
                 encoder_hidden_states_image=None,
                 guidance: Array | None = None, **kwargs) -> Array:
        cfg = self.config
        if isinstance(encoder_hidden_states, (list, tuple)):
            txt, text_states_2 = encoder_hidden_states
        else:
            txt = encoder_hidden_states[:, 1:]
            text_states_2 = encoder_hidden_states[:, 0,
                                                  :cfg.pooled_projection_dim]

        b, c, ot, oh, ow = hidden_states.shape
        pt, ph, pw = cfg.patch_size_thw
        tt, th, tw = ot // pt, oh // ph, ow // pw
        cos, sin = get_nd_rotary_pos_embed(tuple(cfg.rope_axes_dim),
                                           (tt, th, tw), cfg.rope_theta)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)

        vec = self.time_in(timestep)
        vec = vec + self.vector_in(text_states_2.astype(vec.dtype))
        if self.guidance_in is not None and guidance is not None:
            vec = vec + self.guidance_in(guidance)

        img = self.img_in(hidden_states)
        if camera_states is not None:
            img = img + self._camera_latents(
                camera_states.astype(img.dtype), ot).astype(img.dtype)
        img, orig_seq_len = shard_seq(img)
        if img.shape[1] != cos.shape[0]:
            pad = img.shape[1] - cos.shape[0]
            cos = jnp.pad(cos, ((0, pad), (0, 0)), constant_values=1.0)
            sin = jnp.pad(sin, ((0, pad), (0, 0)))
        kv_valid = orig_seq_len if img.shape[1] != orig_seq_len else None
        txt = self.txt_in(txt.astype(img.dtype), timestep)
        txt_len = txt.shape[1]
        freqs_cis = (cos, sin)

        for block in self.double_blocks:
            img, txt = block(img, txt, vec, freqs_cis, kv_valid)
        x = jnp.concatenate([img, txt], axis=1)
        for block in self.single_blocks:
            x = block(x, vec, txt_len, freqs_cis, kv_valid)
        img = x[:, :-txt_len]
        img = unshard_seq(img, orig_seq_len)
        img = self.final_layer(img, vec)
        return unpatchify(img, tt, th, tw, cfg.patch_size_thw,
                          self.out_channels, feature_order="c_pthw")


EntryClass = HunyuanGameCraftTransformer3DModel
