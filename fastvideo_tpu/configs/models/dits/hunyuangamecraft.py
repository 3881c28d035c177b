"""HunyuanGameCraft DiT config + checkpoint mapping.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
hunyuangamecraft.py (:37-140): HunyuanVideo architecture with 33 input
channels (16 latent + 16 gt_latent + 1 mask), no embedded guidance, and
a CameraNet for Plücker-coordinate action conditioning. Checkpoints use
the official (non-diffusers) layout — names largely match our module
tree, with fc1/fc2 and Sequential-index renames.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.configs.models.dits.hunyuan import HunyuanVideoArchConfig

GAMECRAFT_PARAM_NAMES_MAPPING: dict = {
    # official-layout renames (reference hunyuangamecraft.py:57-92)
    r"^(.*)\.img_mlp\.fc1\.(.*)$": r"\1.img_mlp.fc_in.\2",
    r"^(.*)\.img_mlp\.fc2\.(.*)$": r"\1.img_mlp.fc_out.\2",
    r"^(.*)\.txt_mlp\.fc1\.(.*)$": r"\1.txt_mlp.fc_in.\2",
    r"^(.*)\.txt_mlp\.fc2\.(.*)$": r"\1.txt_mlp.fc_out.\2",
    r"^single_blocks\.(\d+)\.mlp\.fc1\.(.*)$":
    r"single_blocks.\1.mlp.fc_in.\2",
    r"^single_blocks\.(\d+)\.mlp\.fc2\.(.*)$":
    r"single_blocks.\1.mlp.fc_out.\2",
    r"^txt_in\.individual_token_refiner\.blocks\.(\d+)\.(.*)$":
    r"txt_in.refiner_blocks.\1.\2",
    r"^vector_in\.in_layer\.(.*)$": r"vector_in.fc_in.\1",
    r"^vector_in\.out_layer\.(.*)$": r"vector_in.fc_out.\1",
    r"^time_in\.mlp\.0\.(.*)$": r"time_in.mlp.fc_in.\1",
    r"^time_in\.mlp\.2\.(.*)$": r"time_in.mlp.fc_out.\1",
    r"^guidance_in\.mlp\.0\.(.*)$": r"guidance_in.mlp.fc_in.\1",
    r"^guidance_in\.mlp\.2\.(.*)$": r"guidance_in.mlp.fc_out.\1",
    r"^final_layer\.adaLN_modulation\.1\.(.*)$":
    r"final_layer.adaLN_modulation.linear.\1",
    r"^txt_in\.refiner_blocks\.(\d+)\.mlp\.fc1\.(.*)$":
    r"txt_in.refiner_blocks.\1.mlp.fc_in.\2",
    r"^txt_in\.refiner_blocks\.(\d+)\.mlp\.fc2\.(.*)$":
    r"txt_in.refiner_blocks.\1.mlp.fc_out.\2",
    # CameraNet Sequential indices -> named modules
    r"^camera_net\.encode_first\.0\.(.*)$": r"camera_net.encode_first_conv.\1",
    r"^camera_net\.encode_first\.1\.(.*)$": r"camera_net.encode_first_norm.\1",
    r"^camera_net\.encode_second\.0\.(.*)$":
    r"camera_net.encode_second_conv.\1",
    r"^camera_net\.encode_second\.1\.(.*)$":
    r"camera_net.encode_second_norm.\1",
    # torch-layout exports of our own module tree (tests) flatten
    # PatchEmbed3D to bare weight/bias
    r"^(camera_net\.camera_in|img_in)\.(weight|bias)$": r"\1.proj.\2",
    # everything else (img_in.proj, double_blocks.N.img_attn_qkv,
    # camera_net.final_proj / .scale / .camera_in.proj, final_layer.linear,
    # ...) passes through verbatim.
}


@dataclasses.dataclass
class HunyuanGameCraftArchConfig(HunyuanVideoArchConfig):
    in_channels: int = 33  # 16 latent + 16 gt_latent + 1 mask
    out_channels: int | None = 16
    guidance_embeds: bool = False
    camera_in_channels: int = 6  # Plücker coordinates
    camera_downscale_coef: int = 8
    camera_out_channels: int = 16
    camera_net: bool = True


@dataclasses.dataclass
class HunyuanGameCraftConfig(ModelConfig):
    arch_config: HunyuanGameCraftArchConfig = dataclasses.field(
        default_factory=HunyuanGameCraftArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(GAMECRAFT_PARAM_NAMES_MAPPING))
