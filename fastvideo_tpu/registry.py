"""Config registry: model path/name -> (PipelineConfig cls, SamplingParam cls).

Analog of /root/reference/fastvideo/registry.py (resolution priority per
docs/inference/architecture.md:38-67): exact id match > name-fragment
detectors > fallback to model_index.json introspection.
"""

from __future__ import annotations

import dataclasses
import os
from collections.abc import Callable

from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.configs.sample import SamplingParam
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclasses.dataclass
class _Entry:
    detector: Callable[[str], bool]
    config_cls: type[PipelineConfig]
    sampling_cls: type[SamplingParam] | None = None
    priority: int = 0


_REGISTRY: list[_Entry] = []


def register_config(detector: Callable[[str], bool] | str,
                    config_cls: type[PipelineConfig],
                    sampling_cls: type[SamplingParam] | None = None,
                    priority: int = 0) -> None:
    if isinstance(detector, str):
        frag = detector.lower()
        detector = lambda name, _frag=frag: _frag in name.lower()  # noqa: E731
    _REGISTRY.append(_Entry(detector, config_cls, sampling_cls, priority))
    _REGISTRY.sort(key=lambda e: -e.priority)


def get_pipeline_config_cls_for_name(
        model_path: str) -> type[PipelineConfig] | None:
    name = os.path.basename(os.path.normpath(model_path)) or model_path
    for entry in _REGISTRY:
        if entry.detector(name) or entry.detector(model_path):
            return entry.config_cls
    return None


def get_sampling_param_cls_for_name(
        model_path: str) -> type[SamplingParam] | None:
    name = os.path.basename(os.path.normpath(model_path)) or model_path
    for entry in _REGISTRY:
        if (entry.detector(name)
                or entry.detector(model_path)) and entry.sampling_cls:
            return entry.sampling_cls
    return None


def _register_builtin() -> None:
    from fastvideo_tpu.configs.pipelines import wan as wan_cfg

    def frag(*frags):
        def det(name: str) -> bool:
            low = name.lower()
            return all(f in low for f in frags)

        return det

    register_config(frag("fastwan2.1", "t2v"), wan_cfg.FastWanT2V480PConfig,
                    priority=10)
    register_config(frag("fastwan"), wan_cfg.FastWanT2V480PConfig, priority=9)
    register_config(frag("lucy-edit"), wan_cfg.LucyEditDevConfig,
                    priority=10)
    register_config(frag("wan", "v2v"), wan_cfg.WanV2VConfig, priority=8)
    register_config(frag("wan2.2", "ti2v"), wan_cfg.Wan2_2_TI2V_5B_Config,
                    priority=8)
    register_config(frag("wan2.2", "t2v"), wan_cfg.Wan2_2_T2V_A14B_Config,
                    priority=8)
    register_config(frag("wan", "i2v", "720"), wan_cfg.WanI2V720PConfig,
                    priority=6)
    register_config(frag("wan", "i2v"), wan_cfg.WanI2V480PConfig, priority=5)
    register_config(frag("wan", "t2v", "14b"), wan_cfg.WanT2V720PConfig,
                    priority=5)
    register_config(frag("wan"), wan_cfg.WanT2V480PConfig, priority=1)

    from fastvideo_tpu.configs.pipelines import hunyuan as hy_cfg

    register_config(frag("fasthunyuan"), hy_cfg.FastHunyuanConfig,
                    priority=10)
    register_config(frag("hunyuan"), hy_cfg.HunyuanConfig, priority=1)

    from fastvideo_tpu.configs.pipelines.hunyuangamecraft import (
        HunyuanGameCraftPipelineConfig)

    register_config(frag("gamecraft"), HunyuanGameCraftPipelineConfig,
                    priority=12)

    from fastvideo_tpu.configs.pipelines import longcat as lc_cfg

    register_config(frag("longcat", "704"), lc_cfg.LongCatT2V704PConfig,
                    priority=13)
    register_config(frag("longcat", "i2v"), lc_cfg.LongCatI2VConfig,
                    priority=13)
    register_config(frag("longcat"), lc_cfg.LongCatT2V480PConfig,
                    priority=12)

    from fastvideo_tpu.configs.pipelines.zimage import ZImagePipelineConfig

    register_config(frag("z-image"), ZImagePipelineConfig, priority=12)
    register_config(frag("zimage"), ZImagePipelineConfig, priority=12)

    from fastvideo_tpu.configs.pipelines import hunyuan15 as hy15_cfg

    register_config(frag("hunyuanvideo-1.5", "720"),
                    hy15_cfg.Hunyuan15T2V720PConfig, priority=12)
    register_config(frag("hunyuanvideo-1.5", "i2v", "720"),
                    hy15_cfg.Hunyuan15I2V720PConfig, priority=13)
    register_config(frag("hunyuanvideo-1.5", "i2v"),
                    hy15_cfg.Hunyuan15I2V480PConfig, priority=12)
    register_config(frag("hunyuanvideo-1.5", "sr"),
                    hy15_cfg.Hunyuan15SR1080PConfig, priority=13)
    register_config(frag("hunyuanvideo-1.5"),
                    hy15_cfg.Hunyuan15T2V480PConfig, priority=11)

    from fastvideo_tpu.configs.pipelines import glm_image as glm_cfg

    register_config(frag("glm-image"), glm_cfg.GlmImagePipelineConfig,
                    glm_cfg.GlmImageSamplingParam, priority=12)
    register_config(frag("glm_image"), glm_cfg.GlmImagePipelineConfig,
                    glm_cfg.GlmImageSamplingParam, priority=12)

    from fastvideo_tpu.configs.pipelines import dreamx_world as dx_cfg

    register_config(frag("dreamx", "-ar"),
                    dx_cfg.DreamXWorld5BARPipelineConfig, priority=12)
    register_config(frag("dreamx"), dx_cfg.DreamXWorld5BCamPipelineConfig,
                    dx_cfg.DreamXWorldSamplingParam, priority=11)

    from fastvideo_tpu.configs.pipelines.lingbotworld import (
        LingBotWorldI2V480PConfig)

    def _lingbotworld_det(name: str) -> bool:
        low = name.lower()
        return (("lingbotworld" in low or "lingbot-world" in low)
                and "causal-fast" not in low and "causalfast" not in low)

    register_config(_lingbotworld_det, LingBotWorldI2V480PConfig,
                    priority=9)

    from fastvideo_tpu.configs.pipelines.lingbotworld2 import (
        LingBotWorld2CausalFastI2V480PConfig)

    def _lingbotworld2_det(name: str) -> bool:
        low = name.lower()
        return (("lingbot-world-v2" in low or "lingbotworld2" in low)
                and ("causal-fast" in low or "causalfast" in low))

    register_config(_lingbotworld2_det,
                    LingBotWorld2CausalFastI2V480PConfig, priority=10)

    from fastvideo_tpu.configs.pipelines import lingbot_video as lbv_cfg

    register_config(frag("lingbot-video"), lbv_cfg.LingBotVideoT2VConfig,
                    lbv_cfg.LingBotVideoSamplingParam, priority=12)
    register_config(frag("lingbot_video"), lbv_cfg.LingBotVideoT2VConfig,
                    lbv_cfg.LingBotVideoSamplingParam, priority=12)

    from fastvideo_tpu.configs.pipelines import matrixgame3 as mg3_cfg

    from fastvideo_tpu.configs.pipelines.matrixgame2 import (
        MatrixGame2I2VConfig)

    register_config(frag("matrix-game-2"), MatrixGame2I2VConfig,
                    priority=13)
    register_config(frag("matrixgame2"), MatrixGame2I2VConfig, priority=13)
    register_config(frag("matrix-game"), mg3_cfg.MatrixGame3I2V720PConfig,
                    mg3_cfg.MatrixGame3SamplingParam, priority=12)
    register_config(frag("matrixgame"), mg3_cfg.MatrixGame3I2V720PConfig,
                    mg3_cfg.MatrixGame3SamplingParam, priority=12)

    from fastvideo_tpu.configs.pipelines import hyworld as hyw_cfg

    register_config(frag("hyworld"), hyw_cfg.HYWorldConfig,
                    hyw_cfg.HYWorldSamplingParam, priority=12)
    register_config(frag("worldplay"), hyw_cfg.HYWorldConfig,
                    hyw_cfg.HYWorldSamplingParam, priority=12)

    from fastvideo_tpu.configs.pipelines import gen3c as g3_cfg

    register_config(frag("gen3c"), g3_cfg.Gen3CPipelineConfig,
                    g3_cfg.Gen3CSamplingParam, priority=12)

    from fastvideo_tpu.configs.pipelines import magi_human as mh_cfg

    register_config(frag("magi"), mh_cfg.MagiHumanPipelineConfig,
                    mh_cfg.MagiHumanSamplingParam, priority=11)

    from fastvideo_tpu.configs.pipelines import minimax_h3 as mmx_cfg

    register_config(frag("minimax"), mmx_cfg.MiniMaxH3PipelineConfig,
                    mmx_cfg.MiniMaxH3SamplingParam, priority=11)

    from fastvideo_tpu.configs.pipelines import stable_audio as sa_cfg

    register_config(frag("stable-audio", "small"),
                    sa_cfg.StableAudioSmallConfig,
                    sa_cfg.StableAudioSamplingParam, priority=13)
    register_config(frag("stable-audio"), sa_cfg.StableAudioOpenConfig,
                    sa_cfg.StableAudioSamplingParam, priority=12)

    from fastvideo_tpu.configs.pipelines import sd35 as sd_cfg

    register_config(frag("stable-diffusion-3"), sd_cfg.SD35Config,
                    priority=5)
    register_config(frag("sd3"), sd_cfg.SD35Config, priority=2)

    from fastvideo_tpu.configs.pipelines import flux as flux_cfg

    register_config(frag("flux"), flux_cfg.FluxPipelineConfig, priority=2)

    from fastvideo_tpu.configs.pipelines import flux2 as flux2_cfg

    register_config(frag("flux.2", "klein"),
                    flux2_cfg.Flux2KleinPipelineConfig, priority=12)
    register_config(frag("flux.2"), flux2_cfg.Flux2PipelineConfig,
                    priority=11)
    register_config(frag("flux2"), flux2_cfg.Flux2PipelineConfig,
                    priority=10)

    from fastvideo_tpu.configs.pipelines import kandinsky5 as k5_cfg

    register_config(frag("kandinsky", "i2v"), k5_cfg.Kandinsky5I2VConfig,
                    priority=11)
    register_config(frag("kandinsky"), k5_cfg.Kandinsky5T2VConfig,
                    priority=10)

    register_config(frag("turbodiffusion", "i2v"),
                    wan_cfg.TurboDiffusionI2VConfig, priority=11)
    register_config(frag("turbodiffusion", "14b"),
                    wan_cfg.TurboDiffusionT2V14BConfig, priority=11)
    register_config(frag("turbodiffusion"), wan_cfg.TurboDiffusionT2VConfig,
                    priority=10)

    from fastvideo_tpu.configs.pipelines import cosmos as cosmos_cfg

    from fastvideo_tpu.configs.pipelines import ltx2 as ltx2_cfg

    register_config(frag("ltx-2"), ltx2_cfg.LTX2T2VConfig, priority=12)
    register_config(frag("ltx2"), ltx2_cfg.LTX2T2VConfig, priority=11)

    register_config(frag("cosmos-predict2.5"), cosmos_cfg.Cosmos25Config,
                    priority=12)
    register_config(frag("cosmos2.5"), cosmos_cfg.Cosmos25Config,
                    priority=12)

    register_config(frag("cosmos"), cosmos_cfg.CosmosConfig, priority=2)


_register_builtin()
