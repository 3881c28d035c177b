"""LongCat-Video DiT config + checkpoint mapping.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
longcat.py (:20-140): 48-block single-stream DiT, hidden 4096, 32 heads,
per-frame 512-dim AdaLN embedding, SwiGLU FFN, fused qkv / kv
projections in the original checkpoint layout (we keep them fused).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig

LONGCAT_PARAM_NAMES_MAPPING: dict = {
    # embedders (reference configs/models/dits/longcat.py:29-34)
    r"^x_embedder\.(.*)$": r"patch_embed.\1",
    r"^t_embedder\.mlp\.0\.(.*)$": r"time_embedder.linear_1.\1",
    r"^t_embedder\.mlp\.2\.(.*)$": r"time_embedder.linear_2.\1",
    r"^y_embedder\.y_proj\.0\.(.*)$": r"caption_embedder.linear_1.\1",
    r"^y_embedder\.y_proj\.2\.(.*)$": r"caption_embedder.linear_2.\1",
    # block modulation + norms
    r"^blocks\.(\d+)\.adaLN_modulation\.1\.(.*)$":
    r"blocks.\1.adaln_linear_1.\2",
    r"^blocks\.(\d+)\.mod_norm_attn\.(.*)$": r"blocks.\1.norm_attn.\2",
    r"^blocks\.(\d+)\.mod_norm_ffn\.(.*)$": r"blocks.\1.norm_ffn.\2",
    r"^blocks\.(\d+)\.pre_crs_attn_norm\.(.*)$": r"blocks.\1.norm_cross.\2",
    # self-attention (qkv stays fused)
    r"^blocks\.(\d+)\.attn\.qkv\.(.*)$": r"blocks.\1.self_attn.qkv.\2",
    r"^blocks\.(\d+)\.attn\.proj\.(.*)$": r"blocks.\1.self_attn.to_out.\2",
    r"^blocks\.(\d+)\.attn\.q_norm\.(.*)$": r"blocks.\1.self_attn.q_norm.\2",
    r"^blocks\.(\d+)\.attn\.k_norm\.(.*)$": r"blocks.\1.self_attn.k_norm.\2",
    # cross-attention (kv stays fused)
    r"^blocks\.(\d+)\.cross_attn\.proj\.(.*)$":
    r"blocks.\1.cross_attn.to_out.\2",
    # final layer
    r"^final_layer\.adaLN_modulation\.1\.(.*)$":
    r"final_layer.adaln_linear.\1",
    r"^final_layer\.norm_final\.(.*)$": r"final_layer.norm.\1",
    r"^final_layer\.linear\.(.*)$": r"final_layer.proj.\1",
    # cross_attn.q_linear / kv_linear / q_norm / k_norm, ffn.w1/w2/w3 pass
    # through verbatim.
}


@dataclasses.dataclass
class LongCatArchConfig(DiTArchConfig):
    hidden_size: int = 4096
    depth: int = 48
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    in_channels: int = 16
    out_channels: int = 16
    patch_size: tuple[int, int, int] = (1, 2, 2)
    mlp_ratio: float = 4.0
    adaln_tembed_dim: int = 512
    caption_channels: int = 4096
    frequency_embedding_size: int = 256
    text_tokens_zero_pad: bool = True
    enable_bsa: bool = False
    bsa_params: dict | None = None

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels


@dataclasses.dataclass
class LongCatVideoConfig(ModelConfig):
    arch_config: LongCatArchConfig = dataclasses.field(
        default_factory=LongCatArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(LONGCAT_PARAM_NAMES_MAPPING))
