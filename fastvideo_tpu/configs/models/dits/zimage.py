"""Z-Image DiT config + checkpoint mapping.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
zimage.py (:14-60). The checkpoint uses the reference's module names
(all_x_embedder."2-1", t_embedder.mlp.0, cap_embedder.0/1, Sequential
indices); mapped to our flattened tree here.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig

ZIMAGE_PARAM_NAMES_MAPPING: dict = {
    r"^all_x_embedder\.[^.]+\.(.*)$": r"x_embedder.\1",
    r"^all_final_layer\.[^.]+\.adaLN_modulation\.1\.(.*)$":
    r"final_layer.adaLN_modulation.\1",
    r"^all_final_layer\.[^.]+\.(.*)$": r"final_layer.\1",
    r"^t_embedder\.mlp\.0\.(.*)$": r"t_embedder.linear_1.\1",
    r"^t_embedder\.mlp\.2\.(.*)$": r"t_embedder.linear_2.\1",
    r"^cap_embedder\.0\.(.*)$": r"cap_norm.\1",
    r"^cap_embedder\.1\.(.*)$": r"cap_linear.\1",
    r"^(.*)\.adaLN_modulation\.0\.(.*)$": r"\1.adaLN_modulation.\2",
    r"^(.*)\.to_out\.0\.(.*)$": r"\1.to_out.\2",
}


@dataclasses.dataclass
class ZImageArchConfig(DiTArchConfig):
    all_patch_size: tuple[int, ...] = (2,)
    all_f_patch_size: tuple[int, ...] = (1,)
    in_channels: int = 16
    dim: int = 3840
    n_layers: int = 30
    n_refiner_layers: int = 2
    n_heads: int = 30
    n_kv_heads: int = 30
    norm_eps: float = 1e-5
    qk_norm: bool = True
    cap_feat_dim: int = 2560
    rope_theta: float = 256.0
    t_scale: float = 1000.0
    axes_dims: tuple[int, ...] = (32, 48, 48)
    axes_lens: tuple[int, ...] = (1536, 512, 512)
    adaln_embed_dim: int = 256
    frequency_embedding_size: int = 256
    timestep_mid_size: int = 1024
    max_period: int = 10000
    seq_multi_of: int = 32

    @property
    def hidden_size(self) -> int:
        return self.dim

    @property
    def num_attention_heads(self) -> int:
        return self.n_heads

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels


@dataclasses.dataclass
class ZImageDiTConfig(ModelConfig):
    arch_config: ZImageArchConfig = dataclasses.field(
        default_factory=ZImageArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(ZIMAGE_PARAM_NAMES_MAPPING))
