"""HY-World DiT config.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
hyworld.py (:20-170): the hy1.5 architecture plus PRoPE/action modules;
official HY-WorldPlay checkpoints use split q/k/v and Sequential-index
names mapped below.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.configs.models.dits.hunyuan15 import (
    HunyuanVideo15ArchConfig)

HYWORLD_PARAM_NAMES_MAPPING: dict = {
    # torch-layout exports of our own module tree (tests) emit
    # img_in.weight for the PatchEmbed3D
    r"^img_in\.(weight|bias)$": r"img_in.proj.\1",
    # official HY-WorldPlay layout (reference hyworld.py config :25-84)
    r"^txt_in\.t_embedder\.mlp\.0\.(.*)$":
    r"txt_in.t_embedder.mlp.fc_in.\1",
    r"^txt_in\.t_embedder\.mlp\.2\.(.*)$":
    r"txt_in.t_embedder.mlp.fc_out.\1",
    r"^txt_in\.c_embedder\.linear_1\.(.*)$": r"txt_in.c_embedder.fc_in.\1",
    r"^txt_in\.c_embedder\.linear_2\.(.*)$": r"txt_in.c_embedder.fc_out.\1",
    r"^txt_in\.individual_token_refiner\.blocks\.(\d+)\.mlp\.fc1\.(.*)$":
    r"txt_in.refiner_blocks.\1.mlp.fc_in.\2",
    r"^txt_in\.individual_token_refiner\.blocks\.(\d+)\.mlp\.fc2\.(.*)$":
    r"txt_in.refiner_blocks.\1.mlp.fc_out.\2",
    r"^txt_in\.individual_token_refiner\.blocks\.(\d+)\."
    r"adaLN_modulation\.1\.(.*)$":
    r"txt_in.refiner_blocks.\1.adaLN_modulation.linear.\2",
    r"^txt_in\.individual_token_refiner\.blocks\.(\d+)\.(.*)$":
    r"txt_in.refiner_blocks.\1.\2",
    r"^time_in\.mlp\.0\.(.*)$":
    r"time_in.timestep_embedder.mlp.fc_in.\1",
    r"^time_in\.mlp\.2\.(.*)$":
    r"time_in.timestep_embedder.mlp.fc_out.\1",
    r"^action_in\.mlp\.0\.(.*)$": r"action_in.mlp.fc_in.\1",
    r"^action_in\.mlp\.2\.(.*)$": r"action_in.mlp.fc_out.\1",
    r"^byt5_in\.layernorm\.(.*)$": r"txt_in_2.norm.\1",
    r"^byt5_in\.fc(\d)\.(.*)$": r"txt_in_2.linear_\1.\2",
    r"^cond_type_embedding\.(.*)$": r"cond_type_embed.\1",
    r"^vision_in\.proj\.0\.(.*)$": r"image_embedder.norm_in.\1",
    r"^vision_in\.proj\.1\.(.*)$": r"image_embedder.linear_1.\1",
    r"^vision_in\.proj\.3\.(.*)$": r"image_embedder.linear_2.\1",
    r"^vision_in\.proj\.4\.(.*)$": r"image_embedder.norm_out.\1",
    r"^double_blocks\.(\d+)\.img_attn_q\.(.*)$":
    (r"double_blocks.\1.img_attn_qkv.\2", 0, 3),
    r"^double_blocks\.(\d+)\.img_attn_k\.(.*)$":
    (r"double_blocks.\1.img_attn_qkv.\2", 1, 3),
    r"^double_blocks\.(\d+)\.img_attn_v\.(.*)$":
    (r"double_blocks.\1.img_attn_qkv.\2", 2, 3),
    r"^double_blocks\.(\d+)\.txt_attn_q\.(.*)$":
    (r"double_blocks.\1.txt_attn_qkv.\2", 0, 3),
    r"^double_blocks\.(\d+)\.txt_attn_k\.(.*)$":
    (r"double_blocks.\1.txt_attn_qkv.\2", 1, 3),
    r"^double_blocks\.(\d+)\.txt_attn_v\.(.*)$":
    (r"double_blocks.\1.txt_attn_qkv.\2", 2, 3),
    r"^double_blocks\.(\d+)\.img_mlp\.fc1\.(.*)$":
    r"double_blocks.\1.img_mlp.fc_in.\2",
    r"^double_blocks\.(\d+)\.img_mlp\.fc2\.(.*)$":
    r"double_blocks.\1.img_mlp.fc_out.\2",
    r"^double_blocks\.(\d+)\.txt_mlp\.fc1\.(.*)$":
    r"double_blocks.\1.txt_mlp.fc_in.\2",
    r"^double_blocks\.(\d+)\.txt_mlp\.fc2\.(.*)$":
    r"double_blocks.\1.txt_mlp.fc_out.\2",
    r"^final_layer\.adaLN_modulation\.1\.(.*)$":
    r"final_layer.adaLN_modulation.linear.\1",
}


@dataclasses.dataclass
class HYWorldArchConfig(HunyuanVideo15ArchConfig):
    pass


@dataclasses.dataclass
class HYWorldConfig(ModelConfig):
    arch_config: HYWorldArchConfig = dataclasses.field(
        default_factory=HYWorldArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(HYWORLD_PARAM_NAMES_MAPPING))
