"""Matrix-Game 2.0 DiT: Wan trunk + mouse/keyboard action attention,
image-conditioned (no text).

Behavioral reference: /root/reference/fastvideo/models/dits/matrixgame2/
model.py (:46-574): the Matrix-Game action module (identical family to
Matrix-Game 3 — action_module.py) on the Wan block, CLIP image tokens as
the cross-attention context (text stream empty), mask+first-frame VAE
conditioning on channels. The Matrix-Game 3 port already carries the
block/action machinery; this model specialises it with the CLIP image
embedder and no camera/memory.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.configs.models.dits.matrixgame3 import (
    MATRIXGAME3_PARAM_NAMES_MAPPING, MatrixGame3ArchConfig)
from fastvideo_tpu.configs.models.dits.wan import WAN_PARAM_NAMES_MAPPING
from fastvideo_tpu.models.dits.matrixgame3 import MatrixGame3WanModel
from fastvideo_tpu.models.dits.wan import WanImageEmbedding

Array = jax.Array


def _mg2_action_config() -> dict:
    """(reference configs/models/dits/matrixgame2.py:35-56)."""
    return {
        "blocks": list(range(15)),
        "enable_mouse": True,
        "enable_keyboard": True,
        "heads_num": 16,
        "hidden_size": 128,
        "img_hidden_size": 1536,
        "keyboard_dim_in": 4,
        "keyboard_hidden_dim": 1024,
        "mouse_dim_in": 2,
        "mouse_hidden_dim": 1024,
        "mouse_qk_dim_list": [8, 28, 28],
        "patch_size": [1, 2, 2],
        "qk_norm": True,
        "qkv_bias": False,
        "rope_dim_list": [8, 28, 28],
        "rope_theta": 256,
        "vae_time_compression_ratio": 4,
        "windows_size": 3,
    }


# the Matrix-Game 2.0 release ships diffusers-style keys (attn1.to_q, ...)
# plus the action-module Sequential names handled by the MG3 table
MATRIXGAME2_PARAM_NAMES_MAPPING: dict = {
    **WAN_PARAM_NAMES_MAPPING,
    **{k: v for k, v in MATRIXGAME3_PARAM_NAMES_MAPPING.items()
       if "action" in k or "keyboard" in k or "mouse" in k
       or "self_attn" in k or "cross_attn" in k or "head" in k
       or "modulation" in k or "norm3" in k},
}


@dataclasses.dataclass
class MatrixGame2ArchConfig(MatrixGame3ArchConfig):
    in_channels: int = 36
    out_channels: int = 16
    num_attention_heads: int = 12
    attention_head_dim: int = 128
    ffn_dim: int = 8960
    num_layers: int = 30
    image_dim: int | None = 1280
    use_memory: bool = False
    action_config: dict = dataclasses.field(
        default_factory=_mg2_action_config)


@dataclasses.dataclass
class MatrixGame2WanVideoConfig(ModelConfig):
    arch_config: MatrixGame2ArchConfig = dataclasses.field(
        default_factory=MatrixGame2ArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(MATRIXGAME2_PARAM_NAMES_MAPPING))


class MatrixGame2WanModel(MatrixGame3WanModel):
    """(reference model.py:347-574): MG3 trunk without memory/camera,
    CLIP image tokens as the cross-attention context."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(config, param_dtype=param_dtype, rngs=rngs)
        image_dim = getattr(config, "image_dim", None)
        if image_dim:
            self.img_emb = WanImageEmbedding(image_dim, self.inner_dim,
                                             param_dtype=param_dtype,
                                             rngs=rngs)
        else:
            self.img_emb = nnx.data(None)

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array,
                 encoder_hidden_states_image: Array | None = None,
                 mouse_cond: Array | None = None,
                 keyboard_cond: Array | None = None, **kwargs) -> Array:
        if isinstance(encoder_hidden_states_image, (list, tuple)):
            encoder_hidden_states_image = (
                encoder_hidden_states_image[0]
                if encoder_hidden_states_image else None)
        ctx = encoder_hidden_states
        if encoder_hidden_states_image is not None and \
                self.img_emb is not None:
            # Matrix-Game 2.0 conditions on CLIP image tokens only
            # (reference MatrixGame2TimeImageEmbedding:66-95)
            ctx = self.img_emb(encoder_hidden_states_image)
        return super().__call__(hidden_states, ctx, timestep,
                                mouse_cond=mouse_cond,
                                keyboard_cond=keyboard_cond)


EntryClass = MatrixGame2WanModel
