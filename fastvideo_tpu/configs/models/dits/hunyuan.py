"""HunyuanVideo DiT config + HF checkpoint mapping.

Mirrors /root/reference/fastvideo/configs/models/dits/hunyuanvideo.py
(including the fused q/k/v slot tuples the loader merges).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig

HUNYUAN_PARAM_NAMES_MAPPING: dict = {
    r"^context_embedder\.time_text_embed\.timestep_embedder\.linear_1\.(.*)$":
    r"txt_in.t_embedder.mlp.fc_in.\1",
    r"^context_embedder\.time_text_embed\.timestep_embedder\.linear_2\.(.*)$":
    r"txt_in.t_embedder.mlp.fc_out.\1",
    r"^context_embedder\.proj_in\.(.*)$": r"txt_in.input_embedder.\1",
    r"^context_embedder\.time_text_embed\.text_embedder\.linear_1\.(.*)$":
    r"txt_in.c_embedder.fc_in.\1",
    r"^context_embedder\.time_text_embed\.text_embedder\.linear_2\.(.*)$":
    r"txt_in.c_embedder.fc_out.\1",
    r"^context_embedder\.token_refiner\.refiner_blocks\.(\d+)\.norm1\.(.*)$":
    r"txt_in.refiner_blocks.\1.norm1.\2",
    r"^context_embedder\.token_refiner\.refiner_blocks\.(\d+)\.norm2\.(.*)$":
    r"txt_in.refiner_blocks.\1.norm2.\2",
    r"^context_embedder\.token_refiner\.refiner_blocks\.(\d+)\.attn\.to_q\.(.*)$":
    (r"txt_in.refiner_blocks.\1.self_attn_qkv.\2", 0, 3),
    r"^context_embedder\.token_refiner\.refiner_blocks\.(\d+)\.attn\.to_k\.(.*)$":
    (r"txt_in.refiner_blocks.\1.self_attn_qkv.\2", 1, 3),
    r"^context_embedder\.token_refiner\.refiner_blocks\.(\d+)\.attn\.to_v\.(.*)$":
    (r"txt_in.refiner_blocks.\1.self_attn_qkv.\2", 2, 3),
    r"^context_embedder\.token_refiner\.refiner_blocks\.(\d+)\.attn\.to_out\.0\.(.*)$":
    r"txt_in.refiner_blocks.\1.self_attn_proj.\2",
    r"^context_embedder\.token_refiner\.refiner_blocks\.(\d+)\.ff\.net\.0(?:\.proj)?\.(.*)$":
    r"txt_in.refiner_blocks.\1.mlp.fc_in.\2",
    r"^context_embedder\.token_refiner\.refiner_blocks\.(\d+)\.ff\.net\.2(?:\.proj)?\.(.*)$":
    r"txt_in.refiner_blocks.\1.mlp.fc_out.\2",
    r"^context_embedder\.token_refiner\.refiner_blocks\.(\d+)\.norm_out\.linear\.(.*)$":
    r"txt_in.refiner_blocks.\1.adaLN_modulation.linear.\2",
    r"^x_embedder\.proj\.(.*)$": r"img_in.proj.\1",
    # torch-layout exports of our own module tree (tests) emit img_in.weight
    r"^img_in\.(weight|bias)$": r"img_in.proj.\1",
    r"^time_text_embed\.timestep_embedder\.linear_1\.(.*)$":
    r"time_in.mlp.fc_in.\1",
    r"^time_text_embed\.timestep_embedder\.linear_2\.(.*)$":
    r"time_in.mlp.fc_out.\1",
    r"^time_text_embed\.guidance_embedder\.linear_1\.(.*)$":
    r"guidance_in.mlp.fc_in.\1",
    r"^time_text_embed\.guidance_embedder\.linear_2\.(.*)$":
    r"guidance_in.mlp.fc_out.\1",
    r"^time_text_embed\.text_embedder\.linear_1\.(.*)$":
    r"vector_in.fc_in.\1",
    r"^time_text_embed\.text_embedder\.linear_2\.(.*)$":
    r"vector_in.fc_out.\1",
    r"^transformer_blocks\.(\d+)\.norm1\.linear\.(.*)$":
    r"double_blocks.\1.img_mod.linear.\2",
    r"^transformer_blocks\.(\d+)\.norm1_context\.linear\.(.*)$":
    r"double_blocks.\1.txt_mod.linear.\2",
    r"^transformer_blocks\.(\d+)\.attn\.norm_q\.(.*)$":
    r"double_blocks.\1.img_attn_q_norm.\2",
    r"^transformer_blocks\.(\d+)\.attn\.norm_k\.(.*)$":
    r"double_blocks.\1.img_attn_k_norm.\2",
    r"^transformer_blocks\.(\d+)\.attn\.to_q\.(.*)$":
    (r"double_blocks.\1.img_attn_qkv.\2", 0, 3),
    r"^transformer_blocks\.(\d+)\.attn\.to_k\.(.*)$":
    (r"double_blocks.\1.img_attn_qkv.\2", 1, 3),
    r"^transformer_blocks\.(\d+)\.attn\.to_v\.(.*)$":
    (r"double_blocks.\1.img_attn_qkv.\2", 2, 3),
    r"^transformer_blocks\.(\d+)\.attn\.add_q_proj\.(.*)$":
    (r"double_blocks.\1.txt_attn_qkv.\2", 0, 3),
    r"^transformer_blocks\.(\d+)\.attn\.add_k_proj\.(.*)$":
    (r"double_blocks.\1.txt_attn_qkv.\2", 1, 3),
    r"^transformer_blocks\.(\d+)\.attn\.add_v_proj\.(.*)$":
    (r"double_blocks.\1.txt_attn_qkv.\2", 2, 3),
    r"^transformer_blocks\.(\d+)\.attn\.to_out\.0\.(.*)$":
    r"double_blocks.\1.img_attn_proj.\2",
    r"^transformer_blocks\.(\d+)\.attn\.to_add_out\.(.*)$":
    r"double_blocks.\1.txt_attn_proj.\2",
    r"^transformer_blocks\.(\d+)\.attn\.norm_added_q\.(.*)$":
    r"double_blocks.\1.txt_attn_q_norm.\2",
    r"^transformer_blocks\.(\d+)\.attn\.norm_added_k\.(.*)$":
    r"double_blocks.\1.txt_attn_k_norm.\2",
    r"^transformer_blocks\.(\d+)\.ff\.net\.0(?:\.proj)?\.(.*)$":
    r"double_blocks.\1.img_mlp.fc_in.\2",
    r"^transformer_blocks\.(\d+)\.ff\.net\.2(?:\.proj)?\.(.*)$":
    r"double_blocks.\1.img_mlp.fc_out.\2",
    r"^transformer_blocks\.(\d+)\.ff_context\.net\.0(?:\.proj)?\.(.*)$":
    r"double_blocks.\1.txt_mlp.fc_in.\2",
    r"^transformer_blocks\.(\d+)\.ff_context\.net\.2(?:\.proj)?\.(.*)$":
    r"double_blocks.\1.txt_mlp.fc_out.\2",
    r"^single_transformer_blocks\.(\d+)\.attn\.norm_q\.(.*)$":
    r"single_blocks.\1.q_norm.\2",
    r"^single_transformer_blocks\.(\d+)\.attn\.norm_k\.(.*)$":
    r"single_blocks.\1.k_norm.\2",
    r"^single_transformer_blocks\.(\d+)\.attn\.to_q\.(.*)$":
    (r"single_blocks.\1.linear1.\2", 0, 4),
    r"^single_transformer_blocks\.(\d+)\.attn\.to_k\.(.*)$":
    (r"single_blocks.\1.linear1.\2", 1, 4),
    r"^single_transformer_blocks\.(\d+)\.attn\.to_v\.(.*)$":
    (r"single_blocks.\1.linear1.\2", 2, 4),
    r"^single_transformer_blocks\.(\d+)\.proj_mlp\.(.*)$":
    (r"single_blocks.\1.linear1.\2", 3, 4),
    r"^single_transformer_blocks\.(\d+)\.proj_out\.(.*)$":
    r"single_blocks.\1.linear2.\2",
    r"^single_transformer_blocks\.(\d+)\.norm\.linear\.(.*)$":
    r"single_blocks.\1.modulation.linear.\2",
    r"^norm_out\.linear\.(.*)$": r"final_layer.adaLN_modulation.linear.\1",
    r"^proj_out\.(.*)$": r"final_layer.linear.\1",
}


@dataclasses.dataclass
class HunyuanVideoArchConfig(DiTArchConfig):
    patch_size: int = 2
    patch_size_t: int = 1
    in_channels: int = 16
    out_channels: int | None = None
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    mlp_ratio: float = 4.0
    num_layers: int = 20
    num_single_layers: int = 40
    num_refiner_layers: int = 2
    rope_axes_dim: tuple[int, int, int] = (16, 56, 56)
    guidance_embeds: bool = True
    text_embed_dim: int = 4096
    pooled_projection_dim: int = 768
    rope_theta: float = 256.0
    qk_norm: str = "rms_norm"
    text_len: int = 256

    @property
    def hidden_size(self) -> int:
        return self.attention_head_dim * self.num_attention_heads

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels

    @property
    def patch_size_thw(self) -> tuple[int, int, int]:
        return (self.patch_size_t, self.patch_size, self.patch_size)


@dataclasses.dataclass
class HunyuanVideoConfig(ModelConfig):
    arch_config: HunyuanVideoArchConfig = dataclasses.field(
        default_factory=HunyuanVideoArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(HUNYUAN_PARAM_NAMES_MAPPING))
