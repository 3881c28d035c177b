"""Model registry: HF class names -> (model builder, arch-config class).

Analog of /root/reference/fastvideo/models/registry.py (hardcoded dicts +
lazy imports resolving ``_class_name`` from diffusers configs).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

_TRANSFORMER_REGISTRY: dict[str, tuple[str, str, str]] = {
    # class_name -> (model module, model class, arch config path)
    "WanTransformer3DModel":
    ("fastvideo_tpu.models.dits.wan", "WanTransformer3DModel",
     "fastvideo_tpu.configs.models.dits.wan:WanArchConfig"),
    "CausalWanTransformer3DModel":
    ("fastvideo_tpu.models.dits.causal_wan", "CausalWanTransformer3DModel",
     "fastvideo_tpu.configs.models.dits.wan:WanArchConfig"),
    "HunyuanVideoTransformer3DModel":
    ("fastvideo_tpu.models.dits.hunyuan", "HunyuanVideoTransformer3DModel",
     "fastvideo_tpu.configs.models.dits.hunyuan:HunyuanVideoArchConfig"),
    "HunyuanVideo15Transformer3DModel":
    ("fastvideo_tpu.models.dits.hunyuan15",
     "HunyuanVideo15Transformer3DModel",
     "fastvideo_tpu.configs.models.dits.hunyuan15:HunyuanVideo15ArchConfig"),
    "HunyuanGameCraftTransformer3DModel":
    ("fastvideo_tpu.models.dits.hunyuangamecraft",
     "HunyuanGameCraftTransformer3DModel",
     "fastvideo_tpu.configs.models.dits.hunyuangamecraft:"
     "HunyuanGameCraftArchConfig"),
    "LongCatTransformer3DModel":
    ("fastvideo_tpu.models.dits.longcat", "LongCatTransformer3DModel",
     "fastvideo_tpu.configs.models.dits.longcat:LongCatArchConfig"),
    "ZImageTransformer2DModel":
    ("fastvideo_tpu.models.dits.zimage", "ZImageTransformer2DModel",
     "fastvideo_tpu.configs.models.dits.zimage:ZImageArchConfig"),
    "MiniMaxH3Transformer3DModel":
    ("fastvideo_tpu.models.dits.minimax_h3", "MiniMaxH3Transformer3DModel",
     "fastvideo_tpu.configs.models.dits.minimax_h3:MiniMaxH3ArchConfig"),
    "GlmImageTransformer2DModel":
    ("fastvideo_tpu.models.dits.glm_image", "GlmImageTransformer2DModel",
     "fastvideo_tpu.configs.models.dits.glm_image:GlmImageArchConfig"),
    "MagiHumanDiT":
    ("fastvideo_tpu.models.dits.magi_human", "MagiHumanDiT",
     "fastvideo_tpu.configs.models.dits.magi_human:MagiHumanArchConfig"),
    "DreamXWorldARTransformer3DModel":
    ("fastvideo_tpu.models.dits.dreamx_world_ar",
     "DreamXWorldARTransformer3DModel",
     "fastvideo_tpu.models.dits.dreamx_world_ar:DreamXWorldARArchConfig"),
    "DreamXWorldTransformer3DModel":
    ("fastvideo_tpu.models.dits.dreamx_world",
     "DreamXWorldTransformer3DModel",
     "fastvideo_tpu.configs.models.dits.dreamx_world:DreamXWorldArchConfig"),
    "Gen3CTransformer3DModel":
    ("fastvideo_tpu.models.dits.gen3c", "Gen3CTransformer3DModel",
     "fastvideo_tpu.configs.models.dits.gen3c:Gen3CArchConfig"),
    "HYWorldTransformer3DModel":
    ("fastvideo_tpu.models.dits.hyworld", "HYWorldTransformer3DModel",
     "fastvideo_tpu.configs.models.dits.hyworld:HYWorldArchConfig"),
    "LingBotVideoTransformer3DModel":
    ("fastvideo_tpu.models.dits.lingbot_video",
     "LingBotVideoTransformer3DModel",
     "fastvideo_tpu.configs.models.dits.lingbot_video:"
     "LingBotVideoArchConfig"),
    "MatrixGame3WanModel":
    ("fastvideo_tpu.models.dits.matrixgame3", "MatrixGame3WanModel",
     "fastvideo_tpu.configs.models.dits.matrixgame3:MatrixGame3ArchConfig"),
    "MatrixGame2WanModel":
    ("fastvideo_tpu.models.dits.matrixgame2", "MatrixGame2WanModel",
     "fastvideo_tpu.models.dits.matrixgame2:MatrixGame2ArchConfig"),
    "StableAudioDiT":
    ("fastvideo_tpu.models.dits.stable_audio", "StableAudioDiT",
     "fastvideo_tpu.configs.models.dits.stable_audio:StableAudioArchConfig"),
    "OobleckVAE":
    ("fastvideo_tpu.models.vaes.oobleck", "OobleckVAE",
     "fastvideo_tpu.models.vaes.oobleck:OobleckVAEArchConfig"),
    "StableAudioMultiConditioner":
    ("fastvideo_tpu.models.encoders.stable_audio_conditioner",
     "StableAudioMultiConditioner",
     "fastvideo_tpu.models.encoders.stable_audio_conditioner:"
     "StableAudioConditionerArchConfig"),
    "WanModel":
    ("fastvideo_tpu.models.dits.wan", "WanTransformer3DModel",
     "fastvideo_tpu.configs.models.dits.wan:WanArchConfig"),
    "SD3Transformer2DModel":
    ("fastvideo_tpu.models.dits.sd3", "SD3Transformer2DModel",
     "fastvideo_tpu.models.dits.sd3:SD3ArchConfig"),
    "FluxTransformer2DModel":
    ("fastvideo_tpu.models.dits.flux", "FluxTransformer2DModel",
     "fastvideo_tpu.models.dits.flux:FluxArchConfig"),
    "Flux2Transformer2DModel":
    ("fastvideo_tpu.models.dits.flux_2", "Flux2Transformer2DModel",
     "fastvideo_tpu.models.dits.flux_2:Flux2ArchConfig"),
    "CosmosTransformer3DModel":
    ("fastvideo_tpu.models.dits.cosmos", "CosmosTransformer3DModel",
     "fastvideo_tpu.models.dits.cosmos:CosmosArchConfig"),
    "Cosmos25Transformer3DModel":
    ("fastvideo_tpu.models.dits.cosmos2_5", "Cosmos25Transformer3DModel",
     "fastvideo_tpu.models.dits.cosmos2_5:Cosmos25ArchConfig"),
    "MiniTrainDIT":
    ("fastvideo_tpu.models.dits.cosmos2_5", "Cosmos25Transformer3DModel",
     "fastvideo_tpu.models.dits.cosmos2_5:Cosmos25ArchConfig"),
    "LTX2Transformer3DModel":
    ("fastvideo_tpu.models.dits.ltx2", "LTX2Transformer3DModel",
     "fastvideo_tpu.models.dits.ltx2:LTX2ArchConfig"),
    "LingBotWorldTransformer3DModel":
    ("fastvideo_tpu.models.dits.lingbotworld",
     "LingBotWorldTransformer3DModel",
     "fastvideo_tpu.models.dits.lingbotworld:LingBotWorldArchConfig"),
    "LingBotWorld2CausalFastTransformer3DModel":
    ("fastvideo_tpu.models.dits.lingbotworld2",
     "LingBotWorld2CausalFastTransformer3DModel",
     "fastvideo_tpu.models.dits.lingbotworld2:"
     "LingBotWorld2CausalFastArchConfig"),
    "Kandinsky5Transformer3DModel":
    ("fastvideo_tpu.models.dits.kandinsky5", "Kandinsky5Transformer3DModel",
     "fastvideo_tpu.models.dits.kandinsky5:Kandinsky5ArchConfig"),
}

_VAE_REGISTRY: dict[str, tuple[str, str, str]] = {
    "AutoencoderKLWan":
    ("fastvideo_tpu.models.vaes.wan", "AutoencoderKLWan",
     "fastvideo_tpu.configs.models.vaes.wan:WanVAEArchConfig"),
    "AutoencoderKLHunyuanVideo":
    ("fastvideo_tpu.models.vaes.hunyuan", "AutoencoderKLHunyuanVideo",
     "fastvideo_tpu.models.vaes.hunyuan:HunyuanVAEArchConfig"),
    # GameCraft ships the original Hunyuan causal-3D VAE under its
    # upstream class name (reference vaes/gamecraftvae.py:243-249)
    "AutoencoderKLCausal3D":
    ("fastvideo_tpu.models.vaes.hunyuan", "AutoencoderKLHunyuanVideo",
     "fastvideo_tpu.models.vaes.hunyuan:HunyuanVAEArchConfig"),
    # LingBot-World 2 wraps the standard Wan2.1 VAE with official keys
    "LingBotWorld2WanVAE":
    ("fastvideo_tpu.models.vaes.wan", "AutoencoderKLWan",
     "fastvideo_tpu.configs.models.vaes.wan:WanVAEArchConfig"),
    "AutoencoderKL":
    ("fastvideo_tpu.models.vaes.autoencoder_kl", "AutoencoderKL",
     "fastvideo_tpu.models.vaes.autoencoder_kl:AutoencoderKLArchConfig"),
    "LTX2CausalVideoAutoencoder":
    ("fastvideo_tpu.models.vaes.ltx2", "LTX2CausalVideoAutoencoder",
     "fastvideo_tpu.models.vaes.ltx2:LTX2VAEArchConfig"),
    "LatentUpsampler":
    ("fastvideo_tpu.models.upsamplers.ltx2_upsampler", "LatentUpsampler",
     "fastvideo_tpu.models.upsamplers.ltx2_upsampler:"
     "LTX2UpsamplerArchConfig"),
    "LTX2LatentUpsampler":
    ("fastvideo_tpu.models.upsamplers.ltx2_upsampler", "LatentUpsampler",
     "fastvideo_tpu.models.upsamplers.ltx2_upsampler:"
     "LTX2UpsamplerArchConfig"),
    "AutoencoderKLFlux2":
    ("fastvideo_tpu.models.vaes.flux2", "AutoencoderKLFlux2",
     "fastvideo_tpu.models.vaes.flux2:Flux2VAEArchConfig"),
    "AutoencoderKLHunyuanVideo15":
    ("fastvideo_tpu.models.vaes.hunyuan15", "AutoencoderKLHunyuanVideo15",
     "fastvideo_tpu.models.vaes.hunyuan15:Hunyuan15VAEArchConfig"),
    "AutoencoderKLHYWorld":
    ("fastvideo_tpu.models.vaes.hyworld", "AutoencoderKLHYWorld",
     "fastvideo_tpu.models.vaes.hyworld:HYWorldVAEArchConfig"),
    "AutoencoderKLMiniMaxH3":
    ("fastvideo_tpu.models.vaes.minimax_h3_video", "AutoencoderKLMiniMaxH3",
     "fastvideo_tpu.models.vaes.minimax_h3_video:"
     "MiniMaxH3VideoVAEArchConfig"),
    "AutoencoderKLMiniMaxH3Audio":
    ("fastvideo_tpu.models.vaes.minimax_h3_audio", "MiniMaxH3AudioVAE",
     "fastvideo_tpu.models.vaes.minimax_h3_audio:"
     "MiniMaxH3AudioVAEArchConfig"),
    "MiniMaxH3AudioVAE":
    ("fastvideo_tpu.models.vaes.minimax_h3_audio", "MiniMaxH3AudioVAE",
     "fastvideo_tpu.models.vaes.minimax_h3_audio:"
     "MiniMaxH3AudioVAEArchConfig"),
}

_ENCODER_REGISTRY: dict[str, tuple[str, str, str]] = {
    "CLIPVisionModel":
    ("fastvideo_tpu.models.encoders.clip", "CLIPVisionModel",
     "fastvideo_tpu.configs.models.encoders.clip:CLIPVisionArchConfig"),
    "CLIPVisionModelWithProjection":
    ("fastvideo_tpu.models.encoders.clip", "CLIPVisionModel",
     "fastvideo_tpu.configs.models.encoders.clip:CLIPVisionArchConfig"),
    "UMT5EncoderModel":
    ("fastvideo_tpu.models.encoders.t5", "T5EncoderModel",
     "fastvideo_tpu.configs.models.encoders.t5:T5ArchConfig"),
    "T5EncoderModel":
    ("fastvideo_tpu.models.encoders.t5", "T5EncoderModel",
     "fastvideo_tpu.configs.models.encoders.t5:T5ArchConfig"),
    "LlamaModel":
    ("fastvideo_tpu.models.encoders.llama", "LlamaEncoderModel",
     "fastvideo_tpu.models.encoders.llama:LlamaArchConfig"),
    "LlamaForCausalLM":
    ("fastvideo_tpu.models.encoders.llama", "LlamaEncoderModel",
     "fastvideo_tpu.models.encoders.llama:LlamaArchConfig"),
    "CLIPTextModel":
    ("fastvideo_tpu.models.encoders.clip", "CLIPTextModel",
     "fastvideo_tpu.models.encoders.clip:CLIPTextArchConfig"),
    "CLIPTextModelWithProjection":
    ("fastvideo_tpu.models.encoders.clip", "CLIPTextModel",
     "fastvideo_tpu.models.encoders.clip:CLIPTextArchConfig"),
    "Qwen2Model":
    ("fastvideo_tpu.models.encoders.qwen2_5", "Qwen2EncoderModel",
     "fastvideo_tpu.models.encoders.qwen2_5:Qwen2ArchConfig"),
    "Qwen2ForCausalLM":
    ("fastvideo_tpu.models.encoders.qwen2_5", "Qwen2EncoderModel",
     "fastvideo_tpu.models.encoders.qwen2_5:Qwen2ArchConfig"),
    "Qwen2_5_VLForConditionalGeneration":
    ("fastvideo_tpu.models.encoders.qwen2_5", "Qwen2EncoderModel",
     "fastvideo_tpu.models.encoders.qwen2_5:Qwen2ArchConfig"),
    "GemmaModel":
    ("fastvideo_tpu.models.encoders.gemma", "GemmaEncoderModel",
     "fastvideo_tpu.models.encoders.gemma:GemmaArchConfig"),
    "GemmaForCausalLM":
    ("fastvideo_tpu.models.encoders.gemma", "GemmaEncoderModel",
     "fastvideo_tpu.models.encoders.gemma:GemmaArchConfig"),
    "SiglipVisionModel":
    ("fastvideo_tpu.models.encoders.siglip", "SiglipVisionModel",
     "fastvideo_tpu.models.encoders.siglip:SiglipVisionArchConfig"),
    "BertModel":
    ("fastvideo_tpu.models.encoders.bert", "BertEncoderModel",
     "fastvideo_tpu.models.encoders.bert:BertArchConfig"),
    "Qwen3Model":
    ("fastvideo_tpu.models.encoders.qwen3", "Qwen3EncoderModel",
     "fastvideo_tpu.models.encoders.qwen3:Qwen3ArchConfig"),
    "Qwen3ForCausalLM":
    ("fastvideo_tpu.models.encoders.qwen3", "Qwen3EncoderModel",
     "fastvideo_tpu.models.encoders.qwen3:Qwen3ArchConfig"),
    "T5GemmaEncoderModel":
    ("fastvideo_tpu.models.encoders.t5gemma", "T5GemmaEncoderModel",
     "fastvideo_tpu.models.encoders.t5gemma:T5GemmaArchConfig"),
    "LTX2GemmaTextEncoderModel":
    ("fastvideo_tpu.models.encoders.ltx2_gemma", "LTX2GemmaTextEncoderModel",
     "fastvideo_tpu.models.encoders.ltx2_gemma:LTX2GemmaArchConfig"),
    "Qwen2_5_VLForConditionalGenerationSimple":
    ("fastvideo_tpu.models.encoders.qwen2_5_vl",
     "Qwen25VLForConditionalGeneration",
     "fastvideo_tpu.models.encoders.qwen2_5_vl:Qwen25VLArchConfig"),
    "Qwen25VLForConditionalGeneration":
    ("fastvideo_tpu.models.encoders.qwen2_5_vl",
     "Qwen25VLForConditionalGeneration",
     "fastvideo_tpu.models.encoders.qwen2_5_vl:Qwen25VLArchConfig"),
    "LingBotVideoQwen3VLTextModel":
    ("fastvideo_tpu.models.encoders.lingbot_video",
     "LingBotVideoQwen3VLTextModel",
     "fastvideo_tpu.models.encoders.lingbot_video:"
     "LingBotVideoQwen3VLTextArchConfig"),
    "MiniMaxH3Qwen3VLConditioner":
    ("fastvideo_tpu.models.encoders.minimax_h3_qwen3_vl",
     "MiniMaxH3Qwen3VLConditioner",
     "fastvideo_tpu.models.encoders.minimax_h3_qwen3_vl:"
     "MiniMaxH3Qwen3VLArchConfig"),
    "Qwen3VLForConditionalGeneration":
    ("fastvideo_tpu.models.encoders.minimax_h3_qwen3_vl",
     "MiniMaxH3Qwen3VLConditioner",
     "fastvideo_tpu.models.encoders.minimax_h3_qwen3_vl:"
     "MiniMaxH3Qwen3VLArchConfig"),
    "MistralModel":
    ("fastvideo_tpu.models.encoders.mistral", "MistralEncoderModel",
     "fastvideo_tpu.models.encoders.mistral:MistralArchConfig"),
    "Mistral3ForConditionalGeneration":
    ("fastvideo_tpu.models.encoders.mistral", "MistralEncoderModel",
     "fastvideo_tpu.models.encoders.mistral:MistralArchConfig"),
}

_SCHEDULER_REGISTRY: dict[str, tuple[str, str]] = {
    "FlowMatchEulerDiscreteScheduler":
    ("fastvideo_tpu.models.schedulers.flow_match_euler",
     "FlowMatchEulerDiscreteScheduler"),
    "UniPCMultistepScheduler":
    ("fastvideo_tpu.models.schedulers.flow_unipc",
     "FlowUniPCMultistepScheduler"),
    "FlowUniPCMultistepScheduler":
    ("fastvideo_tpu.models.schedulers.flow_unipc",
     "FlowUniPCMultistepScheduler"),
    "RCMScheduler":
    ("fastvideo_tpu.models.schedulers.scheduling_rcm", "RCMScheduler"),
    "MiniMaxH3Scheduler":
    ("fastvideo_tpu.models.schedulers.minimax_h3", "MiniMaxH3Scheduler"),
    "SelfForcingFlowMatchScheduler":
    ("fastvideo_tpu.models.schedulers.scheduling_self_forcing_flow_match",
     "SelfForcingFlowMatchScheduler"),
    "FlowMapEulerDiscreteScheduler":
    ("fastvideo_tpu.models.schedulers.scheduling_flow_map_euler",
     "FlowMapEulerDiscreteScheduler"),
}


def _import(qualname: str):
    module, _, attr = qualname.partition(":")
    return getattr(importlib.import_module(module), attr)


def resolve_model_cls(class_name: str) -> tuple[Callable, type]:
    """Returns (model class, arch config class) for a HF ``_class_name``."""
    for registry in (_TRANSFORMER_REGISTRY, _VAE_REGISTRY, _ENCODER_REGISTRY):
        if class_name in registry:
            mod, cls, cfg = registry[class_name]
            model_cls = getattr(importlib.import_module(mod), cls)
            return model_cls, _import(cfg)
    raise ValueError(f"Unknown model class {class_name!r}")


def resolve_scheduler_cls(class_name: str):
    if class_name not in _SCHEDULER_REGISTRY:
        raise ValueError(f"Unknown scheduler class {class_name!r}")
    mod, cls = _SCHEDULER_REGISTRY[class_name]
    return getattr(importlib.import_module(mod), cls)
