"""Matrix-Game 3 DiT config + checkpoint mapping.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
matrixgame3.py (:13-90). Covers both the official checkpoint layout
(self_attn.q/k/v/o, ffn.0/.2, head.head, modulation) and the
FastVideo-internal module names (Sequential text/keyboard/mouse MLPs).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.configs.models.dits.wan import WanArchConfig


def _default_action_config() -> dict:
    return {
        "blocks": list(range(15)),
        "enable_mouse": True,
        "enable_keyboard": True,
        "heads_num": 16,
        "hidden_size": 128,
        "img_hidden_size": 3072,
        "keyboard_dim_in": 6,
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


MATRIXGAME3_PARAM_NAMES_MAPPING: dict = {
    # official checkpoint layout
    r"^patch_embedding\.(weight|bias)$": r"patch_embedding.proj.\1",
    r"^patch_embedding_wancamctrl\.(.*)$":
    r"camera_patch_embedding.proj.\1",
    r"^time_embedding\.0\.(.*)$":
    r"condition_embedder.time_embedder.mlp.fc_in.\1",
    r"^time_embedding\.2\.(.*)$":
    r"condition_embedder.time_embedder.mlp.fc_out.\1",
    r"^time_projection\.1\.(.*)$":
    r"condition_embedder.time_modulation.linear.\1",
    r"^head\.head\.(.*)$": r"proj_out.\1",
    r"^head\.modulation$": r"scale_shift_table",
    r"^blocks\.(\d+)\.self_attn\.q\.(.*)$": r"blocks.\1.to_q.\2",
    r"^blocks\.(\d+)\.self_attn\.k\.(.*)$": r"blocks.\1.to_k.\2",
    r"^blocks\.(\d+)\.self_attn\.v\.(.*)$": r"blocks.\1.to_v.\2",
    r"^blocks\.(\d+)\.self_attn\.o\.(.*)$": r"blocks.\1.to_out.\2",
    r"^blocks\.(\d+)\.self_attn\.norm_(q|k)\.(.*)$":
    r"blocks.\1.norm_\2.\3",
    r"^blocks\.(\d+)\.cross_attn\.q\.(.*)$": r"blocks.\1.attn2.to_q.\2",
    r"^blocks\.(\d+)\.cross_attn\.k\.(.*)$": r"blocks.\1.attn2.to_k.\2",
    r"^blocks\.(\d+)\.cross_attn\.v\.(.*)$": r"blocks.\1.attn2.to_v.\2",
    r"^blocks\.(\d+)\.cross_attn\.o\.(.*)$": r"blocks.\1.attn2.to_out.\2",
    r"^blocks\.(\d+)\.cross_attn\.norm_(q|k)\.(.*)$":
    r"blocks.\1.attn2.norm_\2.\3",
    r"^blocks\.(\d+)\.ffn\.0\.(.*)$": r"blocks.\1.ffn.fc_in.\2",
    r"^blocks\.(\d+)\.ffn\.2\.(.*)$": r"blocks.\1.ffn.fc_out.\2",
    r"^blocks\.(\d+)\.norm3\.(.*)$":
    r"blocks.\1.self_attn_residual_norm.norm.\2",
    r"^blocks\.(\d+)\.modulation$": r"blocks.\1.scale_shift_table",
    # FastVideo-internal Sequential names -> our named modules
    r"^text_embedding\.0\.(.*)$": r"text_embedding_1.\1",
    r"^text_embedding\.2\.(.*)$": r"text_embedding_2.\1",
    r"^(.*)\.keyboard_embed\.0\.(.*)$": r"\1.keyboard_embed_1.\2",
    r"^(.*)\.keyboard_embed\.2\.(.*)$": r"\1.keyboard_embed_2.\2",
    r"^(.*)\.mouse_mlp\.0\.(.*)$": r"\1.mouse_mlp_1.\2",
    r"^(.*)\.mouse_mlp\.2\.(.*)$": r"\1.mouse_mlp_2.\2",
    r"^(.*)\.mouse_mlp\.3\.(.*)$": r"\1.mouse_mlp_norm.\2",
}


@dataclasses.dataclass
class MatrixGame3ArchConfig(WanArchConfig):
    in_channels: int = 48
    out_channels: int = 48
    num_attention_heads: int = 24
    attention_head_dim: int = 128
    ffn_dim: int = 14336
    num_layers: int = 30
    use_memory: bool = True
    sigma_theta: float = 0.8
    camera_embed_in_channels: int = 1536
    action_config: dict = dataclasses.field(
        default_factory=_default_action_config)


@dataclasses.dataclass
class MatrixGame3WanVideoConfig(ModelConfig):
    arch_config: MatrixGame3ArchConfig = dataclasses.field(
        default_factory=MatrixGame3ArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(MATRIXGAME3_PARAM_NAMES_MAPPING))
