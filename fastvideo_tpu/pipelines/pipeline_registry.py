"""Pipeline registry: model_index _class_name -> pipeline class.

Analog of /root/reference/fastvideo/pipelines/pipeline_registry.py:25-99.
"""

from __future__ import annotations

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

_PIPELINES: dict[str, str] = {
    # HF diffusers class name -> our pipeline qualname
    "WanPipeline": "fastvideo_tpu.pipelines.basic.wan.wan_pipeline:WanPipeline",
    "WanImageToVideoPipeline":
    "fastvideo_tpu.pipelines.basic.wan.wan_pipeline:WanImageToVideoPipeline",
    "WanDMDPipeline":
    "fastvideo_tpu.pipelines.basic.wan.wan_pipeline:WanDMDPipeline",
    "WanCausalDMDPipeline":
    "fastvideo_tpu.pipelines.basic.wan.wan_pipeline:WanCausalDMDPipeline",
    "CausalWanPipeline":
    "fastvideo_tpu.pipelines.basic.wan.wan_pipeline:WanCausalDMDPipeline",
    "WanVideoToVideoPipeline":
    "fastvideo_tpu.pipelines.basic.wan.wan_v2v_pipeline:"
    "WanVideoToVideoPipeline",
    "LucyEditPipeline":
    "fastvideo_tpu.pipelines.basic.wan.wan_v2v_pipeline:LucyEditPipeline",
    "LingBotWorldImageToVideoPipeline":
    "fastvideo_tpu.pipelines.basic.lingbotworld.lingbotworld_pipeline:"
    "LingBotWorldImageToVideoPipeline",
    "LingBotWorld2CausalFastPipeline":
    "fastvideo_tpu.pipelines.basic.lingbotworld2.causal_fast_pipeline:"
    "LingBotWorld2CausalFastPipeline",
    "HunyuanVideoPipeline":
    "fastvideo_tpu.pipelines.basic.hunyuan.hunyuan_pipeline:"
    "HunyuanVideoPipeline",
    "HunyuanVideo15Pipeline":
    "fastvideo_tpu.pipelines.basic.hunyuan15.hunyuan15_pipeline:"
    "HunyuanVideo15Pipeline",
    "HunyuanVideo15ImageToVideoPipeline":
    "fastvideo_tpu.pipelines.basic.hunyuan15.hunyuan15_pipeline:"
    "HunyuanVideo15I2VPipeline",
    "HunyuanVideo15SRPipeline":
    "fastvideo_tpu.pipelines.basic.hunyuan15.hunyuan15_pipeline:"
    "HunyuanVideo15SRPipeline",
    "HunyuanGameCraftPipeline":
    "fastvideo_tpu.pipelines.basic.gamecraft.gamecraft_pipeline:"
    "HunyuanGameCraftPipeline",
    "LongCatPipeline":
    "fastvideo_tpu.pipelines.basic.longcat.longcat_pipeline:LongCatPipeline",
    "LongCatImageToVideoPipeline":
    "fastvideo_tpu.pipelines.basic.longcat.longcat_pipeline:"
    "LongCatImageToVideoPipeline",
    "ZImagePipeline":
    "fastvideo_tpu.pipelines.basic.zimage.zimage_pipeline:ZImagePipeline",
    "SD35Pipeline":
    "fastvideo_tpu.pipelines.basic.sd35.sd35_pipeline:SD35Pipeline",
    "StableDiffusion3Pipeline":
    "fastvideo_tpu.pipelines.basic.sd35.sd35_pipeline:"
    "StableDiffusion3Pipeline",
    "FluxPipeline":
    "fastvideo_tpu.pipelines.basic.flux.flux_pipeline:FluxPipeline",
    "Flux2Pipeline":
    "fastvideo_tpu.pipelines.basic.flux2.flux2_pipeline:Flux2Pipeline",
    "Flux2KleinPipeline":
    "fastvideo_tpu.pipelines.basic.flux2.flux2_pipeline:Flux2Pipeline",
    "Kandinsky5Pipeline":
    "fastvideo_tpu.pipelines.basic.kandinsky5.kandinsky5_pipeline:"
    "Kandinsky5Pipeline",
    "Kandinsky5T2VPipeline":
    "fastvideo_tpu.pipelines.basic.kandinsky5.kandinsky5_pipeline:"
    "Kandinsky5Pipeline",
    "LTX2Pipeline":
    "fastvideo_tpu.pipelines.basic.ltx2.ltx2_pipeline:LTX2Pipeline",
    "Cosmos2_5Pipeline":
    "fastvideo_tpu.pipelines.basic.cosmos.cosmos_pipeline:Cosmos2_5Pipeline",
    "TurboDiffusionPipeline":
    "fastvideo_tpu.pipelines.basic.turbodiffusion.turbodiffusion_pipeline:"
    "TurboDiffusionPipeline",
    "TurboDiffusionI2VPipeline":
    "fastvideo_tpu.pipelines.basic.turbodiffusion.turbodiffusion_pipeline:"
    "TurboDiffusionI2VPipeline",
    "Cosmos2VideoToWorldPipeline":
    "fastvideo_tpu.pipelines.basic.cosmos.cosmos_pipeline:"
    "Cosmos2VideoToWorldPipeline",
    "StableAudioPipeline":
    "fastvideo_tpu.pipelines.basic.stable_audio.stable_audio_pipeline:"
    "StableAudioPipeline",
    "GlmImagePipeline":
    "fastvideo_tpu.pipelines.basic.glm_image.glm_image_pipeline:"
    "GlmImagePipeline",
    "DreamXWorldPipeline":
    "fastvideo_tpu.pipelines.basic.dreamx_world.dreamx_world_pipeline:"
    "DreamXWorldPipeline",
    "DreamXWorldARPipeline":
    "fastvideo_tpu.pipelines.basic.dreamx_world.dreamx_world_pipeline:"
    "DreamXWorldARPipeline",
    "LingBotVideoPipeline":
    "fastvideo_tpu.pipelines.basic.lingbot_video.lingbot_video_pipeline:"
    "LingBotVideoPipeline",
    "MatrixGame2I2VPipeline":
    "fastvideo_tpu.pipelines.basic.matrixgame2.matrixgame2_pipeline:"
    "MatrixGame2I2VPipeline",
    "MatrixGamePipeline":
    "fastvideo_tpu.pipelines.basic.matrixgame2.matrixgame2_pipeline:"
    "MatrixGamePipeline",
    "MatrixGame3I2VPipeline":
    "fastvideo_tpu.pipelines.basic.matrixgame3.matrixgame3_pipeline:"
    "MatrixGame3I2VPipeline",
    "HYWorldPipeline":
    "fastvideo_tpu.pipelines.basic.hyworld.hyworld_pipeline:"
    "HYWorldPipeline",
    "Gen3CPipeline":
    "fastvideo_tpu.pipelines.basic.gen3c.gen3c_pipeline:Gen3CPipeline",
    "MagiHumanPipeline":
    "fastvideo_tpu.pipelines.basic.magi_human.magi_human_pipeline:"
    "MagiHumanPipeline",
    "MiniMaxH3ModularPipeline":
    "fastvideo_tpu.pipelines.basic.minimax_h3.minimax_h3_pipeline:"
    "MiniMaxH3ModularPipeline",
    "MiniMaxH3Pipeline":
    "fastvideo_tpu.pipelines.basic.minimax_h3.minimax_h3_pipeline:"
    "MiniMaxH3ModularPipeline",
    "CosmosVideoToWorldPipeline":
    "fastvideo_tpu.pipelines.basic.cosmos.cosmos_pipeline:"
    "Cosmos2VideoToWorldPipeline",
}


def register_pipeline(class_name: str, qualname: str) -> None:
    _PIPELINES[class_name] = qualname


def resolve_pipeline_cls(class_name: str, workload_type: str = "t2v",
                         dmd: bool = False):
    import importlib

    if dmd and class_name == "WanPipeline":
        class_name = "WanDMDPipeline"
    if class_name not in _PIPELINES:
        raise ValueError(
            f"No pipeline registered for {class_name!r}; known: "
            f"{sorted(_PIPELINES)}")
    mod, _, attr = _PIPELINES[class_name].partition(":")
    return getattr(importlib.import_module(mod), attr)
