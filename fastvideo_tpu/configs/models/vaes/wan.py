"""Wan VAE architecture config.

Mirrors /root/reference/fastvideo/configs/models/vaes/wanvae.py (Wan2.1
defaults; Wan2.2 TI2V overrides arrive via the HF config.json:
is_residual=True, z_dim=48, patch_size=2).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from fastvideo_tpu.configs.models.base import ModelConfig, VAEArchConfig

# torch WanResample nests its spatial conv in a Sequential (`resample.1`);
# ours is a named submodule.
WAN_VAE_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^(.*)\.resample\.1\.(weight|bias)$": r"\1.resample_conv.\2",
}


def _residual_rules(src: str, dst: str) -> dict[str, str]:
    """Official Wan-VAE ResidualBlock Sequential indices -> our named
    modules (reference vaes/lingbotworld2_wanvae.py:187-204). A named
    leaf group keeps the rules correct when ``src`` carries its own
    capture group (the encoder's flat index)."""
    return {
        rf"^{src}\.residual\.0\.(?P<leaf>gamma|bias)$":
        rf"{dst}.norm1.\g<leaf>",
        rf"^{src}\.residual\.2\.(?P<leaf>weight|bias)$":
        rf"{dst}.conv1.\g<leaf>",
        rf"^{src}\.residual\.3\.(?P<leaf>gamma|bias)$":
        rf"{dst}.norm2.\g<leaf>",
        rf"^{src}\.residual\.6\.(?P<leaf>weight|bias)$":
        rf"{dst}.conv2.\g<leaf>",
        rf"^{src}\.shortcut\.(?P<leaf>weight|bias)$":
        rf"{dst}.conv_shortcut.\g<leaf>",
    }


def official_wan_vae_mapping(num_res_blocks: int = 2,
                             num_stages: int = 4) -> dict[str, str]:
    """Key table for the OFFICIAL (non-diffusers) Wan2.1 VAE layout used
    by LingBot-World 2 and the original Wan release (reference
    vaes/lingbotworld2_wanvae.py:266-470): flat ``downsamples``/
    ``upsamples`` Sequentials, ``middle`` triplets, ``head`` Sequentials
    and top-level 1x1 quant convs. The decoder's flat indices fold into
    our nested up_blocks for the canonical stage layout."""
    rules: dict[str, str] = {}
    # encoder: flat downsamples map 1:1 onto our flat down_blocks
    rules.update(_residual_rules(r"encoder\.downsamples\.(\d+)",
                                 r"encoder.down_blocks.\g<1>"))
    rules[r"^encoder\.downsamples\.(\d+)\.resample\.1\.(weight|bias)$"] = \
        r"encoder.down_blocks.\1.resample_conv.\2"
    rules[r"^encoder\.downsamples\.(\d+)\.time_conv\.(weight|bias)$"] = \
        r"encoder.down_blocks.\1.time_conv.\2"
    for coder in ("encoder", "decoder"):
        rules.update(_residual_rules(rf"{coder}\.middle\.0",
                                     f"{coder}.mid_block.resnets.0"))
        rules.update(_residual_rules(rf"{coder}\.middle\.2",
                                     f"{coder}.mid_block.resnets.1"))
        rules[rf"^{coder}\.middle\.1\.norm\.(gamma|bias)$"] = \
            rf"{coder}.mid_block.attentions.0.norm.\1"
        rules[rf"^{coder}\.middle\.1\.(to_qkv|proj)\.(weight|bias)$"] = \
            rf"{coder}.mid_block.attentions.0.\1.\2"
        rules[rf"^{coder}\.head\.0\.(gamma|bias)$"] = \
            rf"{coder}.norm_out.\1"
        rules[rf"^{coder}\.head\.2\.(weight|bias)$"] = \
            rf"{coder}.conv_out.\1"
        rules[rf"^{coder}\.conv1\.(weight|bias)$"] = rf"{coder}.conv_in.\1"
    # decoder: flat upsamples -> nested up_blocks (num_res_blocks + 1
    # resblocks then a resample per non-final stage)
    per_stage = num_res_blocks + 2  # resblocks + resample slot
    for stage in range(num_stages):
        base = stage * per_stage
        for j in range(num_res_blocks + 1):
            rules.update(_residual_rules(
                rf"decoder\.upsamples\.{base + j}",
                f"decoder.up_blocks.{stage}.resnets.{j}"))
        rs = base + num_res_blocks + 1
        rules[rf"^decoder\.upsamples\.{rs}\.resample\.1\.(weight|bias)$"] \
            = rf"decoder.up_blocks.{stage}.upsamplers.0.resample_conv.\1"
        rules[rf"^decoder\.upsamples\.{rs}\.time_conv\.(weight|bias)$"] = \
            rf"decoder.up_blocks.{stage}.upsamplers.0.time_conv.\1"
    # top-level 1x1 quant convs
    rules[r"^conv1\.(weight|bias)$"] = r"quant_conv.\1"
    rules[r"^conv2\.(weight|bias)$"] = r"post_quant_conv.\1"
    # the LingBotWorld2WanVAE wrapper nests everything under ``model.``;
    # the loader applies ONE rule per key, so fold the optional prefix
    # into every pattern (plus a bare strip for passthrough keys)
    rules = {p.replace("^", r"^(?:model\.)?", 1): r
             for p, r in rules.items()}
    rules[r"^model\.(.*)$"] = r"\1"
    return rules


@dataclasses.dataclass
class WanVAEArchConfig(VAEArchConfig):
    base_dim: int = 96
    decoder_base_dim: int | None = None
    z_dim: int = 16
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: tuple[float, ...] = ()
    temperal_downsample: tuple[bool, ...] = (False, True, True)
    dropout: float = 0.0
    latents_mean: tuple[float, ...] = (
        -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
        0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921)
    latents_std: tuple[float, ...] = (
        2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
        3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160)
    is_residual: bool = False
    in_channels: int = 3
    out_channels: int = 3
    patch_size: int | None = None
    scale_factor_temporal: int = 4
    scale_factor_spatial: int = 8
    clip_output: bool = True

    @property
    def temporal_compression_ratio(self) -> int:
        return self.scale_factor_temporal

    @property
    def spatial_compression_ratio(self) -> int:
        return self.scale_factor_spatial

    def latents_mean_arr(self) -> np.ndarray:
        return np.asarray(self.latents_mean, dtype=np.float32)

    def latents_std_arr(self) -> np.ndarray:
        return np.asarray(self.latents_std, dtype=np.float32)


@dataclasses.dataclass
class WanVAEConfig(ModelConfig):
    arch_config: WanVAEArchConfig = dataclasses.field(
        default_factory=WanVAEArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(WAN_VAE_PARAM_NAMES_MAPPING))


@dataclasses.dataclass
class OfficialWanVAEConfig(WanVAEConfig):
    """Official-layout checkpoints (LingBot-World 2 / original Wan
    release): same AutoencoderKLWan module, official key table."""

    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=official_wan_vae_mapping)
    load_encoder: bool = True
    load_decoder: bool = True
    use_tiling: bool = False
    tile_sample_min_height: int = 256
    tile_sample_min_width: int = 256
    tile_sample_stride_height: int = 192
    tile_sample_stride_width: int = 192
