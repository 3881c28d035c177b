"""GEN3C DiT config + checkpoint mapping.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
gen3c.py (:17-180). Two mapping layers: the official checkpoint's
``net.blocks.blockN.blocks.{0,1,2}`` Sequential layout, and the
FastVideo-internal names (used by our parity tests / re-exports).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig

GEN3C_PARAM_NAMES_MAPPING: dict = {
    # --- official checkpoint layout (reference gen3c.py:17-91) ---
    r"^net\.x_embedder\.proj\.1\.(.*)$": r"patch_embed.\1",
    r"^net\.t_embedder\.1\.linear_1\.(.*)$":
    r"time_embed.t_embedder.linear_1.\1",
    r"^net\.t_embedder\.1\.linear_2\.(.*)$":
    r"time_embed.t_embedder.linear_2.\1",
    r"^net\.augment_sigma_embedder\.1\.linear_1\.(.*)$":
    r"augment_sigma_embed.t_embedder.linear_1.\1",
    r"^net\.augment_sigma_embedder\.1\.linear_2\.(.*)$":
    r"augment_sigma_embed.t_embedder.linear_2.\1",
    r"^net\.affline_norm\.(.*)$": r"affine_norm.\1",
    r"^net\.extra_pos_embedder\.(pos_emb_[thw])$":
    r"learnable_pos_embed.\1",
    r"^net\.blocks\.block(\d+)\.blocks\.0\.block\.attn\.to_(q|k|v)\.0\.(.*)$":
    r"transformer_blocks.\1.attn1.to_\2.\3",
    r"^net\.blocks\.block(\d+)\.blocks\.0\.block\.attn\.to_q\.1\.(.*)$":
    r"transformer_blocks.\1.attn1.norm_q.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.0\.block\.attn\.to_k\.1\.(.*)$":
    r"transformer_blocks.\1.attn1.norm_k.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.0\.block\.attn\.to_out\.0\.(.*)$":
    r"transformer_blocks.\1.attn1.to_out.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.0\.adaLN_modulation\.1\.(.*)$":
    r"transformer_blocks.\1.adaln_self.linear_1.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.0\.adaLN_modulation\.2\.(.*)$":
    r"transformer_blocks.\1.adaln_self.linear_2.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.1\.block\.attn\.to_(q|k|v)\.0\.(.*)$":
    r"transformer_blocks.\1.attn2.to_\2.\3",
    r"^net\.blocks\.block(\d+)\.blocks\.1\.block\.attn\.to_q\.1\.(.*)$":
    r"transformer_blocks.\1.attn2.norm_q.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.1\.block\.attn\.to_k\.1\.(.*)$":
    r"transformer_blocks.\1.attn2.norm_k.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.1\.block\.attn\.to_out\.0\.(.*)$":
    r"transformer_blocks.\1.attn2.to_out.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.1\.adaLN_modulation\.1\.(.*)$":
    r"transformer_blocks.\1.adaln_cross.linear_1.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.1\.adaLN_modulation\.2\.(.*)$":
    r"transformer_blocks.\1.adaln_cross.linear_2.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.2\.block\.layer1\.(.*)$":
    r"transformer_blocks.\1.mlp.fc_in.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.2\.block\.layer2\.(.*)$":
    r"transformer_blocks.\1.mlp.fc_out.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.2\.adaLN_modulation\.1\.(.*)$":
    r"transformer_blocks.\1.adaln_mlp.linear_1.\2",
    r"^net\.blocks\.block(\d+)\.blocks\.2\.adaLN_modulation\.2\.(.*)$":
    r"transformer_blocks.\1.adaln_mlp.linear_2.\2",
    r"^net\.final_layer\.linear\.(.*)$": r"final_layer.proj_out.\1",
    r"^net\.final_layer\.adaLN_modulation\.1\.(.*)$":
    r"final_layer.adaln.linear_1.\1",
    r"^net\.final_layer\.adaLN_modulation\.2\.(.*)$":
    r"final_layer.adaln.linear_2.\1",
    # --- FastVideo-internal layout (reference torch module) ---
    r"^patch_embed\.proj\.(.*)$": r"patch_embed.\1",
    r"^(.*)\.adaln_modulation_self_attn\.1\.(.*)$":
    r"\1.adaln_self.linear_1.\2",
    r"^(.*)\.adaln_modulation_self_attn\.2\.(.*)$":
    r"\1.adaln_self.linear_2.\2",
    r"^(.*)\.adaln_modulation_cross_attn\.1\.(.*)$":
    r"\1.adaln_cross.linear_1.\2",
    r"^(.*)\.adaln_modulation_cross_attn\.2\.(.*)$":
    r"\1.adaln_cross.linear_2.\2",
    r"^(.*)\.adaln_modulation_mlp\.1\.(.*)$": r"\1.adaln_mlp.linear_1.\2",
    r"^(.*)\.adaln_modulation_mlp\.2\.(.*)$": r"\1.adaln_mlp.linear_2.\2",
    r"^final_layer\.adaln_modulation\.1\.(.*)$":
    r"final_layer.adaln.linear_1.\1",
    r"^final_layer\.adaln_modulation\.2\.(.*)$":
    r"final_layer.adaln.linear_2.\1",
}


@dataclasses.dataclass
class Gen3CArchConfig(DiTArchConfig):
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 28
    mlp_ratio: float = 4.0
    text_embed_dim: int = 1024
    adaln_lora_dim: int = 256
    use_adaln_lora: bool = True
    max_size: tuple[int, int, int] = (128, 240, 240)
    rope_scale: tuple[float, float, float] = (2.0, 1.0, 1.0)
    rope_enable_fps_modulation: bool = True
    # 2 * VAE latent channels (image + mask latent per 3D-cache buffer)
    channels_per_buffer: int = 32
    concat_padding_mask: bool = True
    qk_norm: str = "rms_norm"
    eps: float = 1e-6
    patch_size: tuple[int, int, int] = (1, 2, 2)
    frame_buffer_max: int = 2
    add_augment_sigma_embedding: bool = True
    extra_pos_embed_type: str = "learnable"
    affine_emb_norm: bool = True

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels


@dataclasses.dataclass
class Gen3CVideoConfig(ModelConfig):
    arch_config: Gen3CArchConfig = dataclasses.field(
        default_factory=Gen3CArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(GEN3C_PARAM_NAMES_MAPPING))
