"""HunyuanVideo pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/hunyuan.py
(:14-100): LLaMA text encoding through a video-description chat template
(crop_start 95, intermediate hidden state via skip layer 2) + CLIP pooled
embedding; distilled embedded guidance (6.0 * 1000) instead of CFG;
FlowMatchEuler with shift 7 (17 for FastHunyuan).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.hunyuan import HunyuanVideoConfig
from fastvideo_tpu.configs.pipelines.base import PipelineConfig

PROMPT_TEMPLATE_ENCODE_VIDEO = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by "
    "detailing the following aspects: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical "
    "movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:"
    "<|eot_id|><|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")

PROMPT_TEMPLATE_CROP_START = 95
HIDDEN_STATE_SKIP_LAYER = 2


def llama_preprocess_text(prompt: str) -> str:
    return PROMPT_TEMPLATE_ENCODE_VIDEO.format(prompt)


def llama_postprocess_text(outputs):
    """Intermediate hidden state (skip 2 from the top), template cropped."""
    assert outputs.hidden_states is not None, \
        "llama encoder must run with output_hidden_states=True"
    hs = outputs.hidden_states[-(HIDDEN_STATE_SKIP_LAYER + 1)]
    return hs[:, PROMPT_TEMPLATE_CROP_START:]


def clip_preprocess_text(prompt: str) -> str:
    return prompt


def clip_postprocess_text(outputs):
    return outputs.pooler_output


def _text_encoder_configs():
    from fastvideo_tpu.models.encoders.clip import CLIPTextConfig
    from fastvideo_tpu.models.encoders.llama import LlamaConfig

    return (LlamaConfig(), CLIPTextConfig())


def _vae_config():
    from fastvideo_tpu.models.vaes.hunyuan import HunyuanVAEConfig

    return HunyuanVAEConfig()


@dataclasses.dataclass
class HunyuanConfig(PipelineConfig):
    dit_config: HunyuanVideoConfig = dataclasses.field(
        default_factory=HunyuanVideoConfig)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_text_encoder_configs)
    preprocess_text_funcs: tuple = (llama_preprocess_text,
                                    clip_preprocess_text)
    postprocess_text_funcs: tuple = (llama_postprocess_text,
                                     clip_postprocess_text)
    # LLaMA: 256 text tokens + 95 template tokens; CLIP: 77
    text_encoder_max_lengths: tuple = (256 + PROMPT_TEMPLATE_CROP_START, 77)
    text_encoder_extra_kwargs: tuple = ({"output_hidden_states": True}, {})
    text_encoder_precisions: tuple = ("bf16", "bf16")

    embedded_cfg_scale: float = 6.0
    flow_shift: float = 7.0
    precision: str = "bf16"
    vae_precision: str = "bf16"


@dataclasses.dataclass
class FastHunyuanConfig(HunyuanConfig):
    """FastHunyuan (distilled) weights: higher shift, few steps."""

    flow_shift: float = 17.0
