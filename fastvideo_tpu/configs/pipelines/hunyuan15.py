"""HunyuanVideo-1.5 pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
hunyuan15.py (:17-160): Qwen2.5-VL text encoding through a video-
description system prompt (template crop 108, hidden state -3) plus a
ByT5 glyph stream fed by quoted-text extraction; FlowMatchEuler shift 5;
DCAE Hunyuan-1.5 VAE (16x spatial). The reference's chat-template
tokenization is flattened to a plain system+user string here (the
tokenizer-side template is equivalent for text-only prompts).
"""

from __future__ import annotations

import dataclasses
import re

from fastvideo_tpu.configs.models.dits.hunyuan15 import HunyuanVideo15Config
from fastvideo_tpu.configs.pipelines.base import PipelineConfig

PROMPT_TEMPLATE_TOKEN_LENGTH = 108

PROMPT_TEMPLATE_ENCODE_VIDEO = (
    "You are a helpful assistant. Describe the video by detailing the "
    "following aspects: "
    "1. The main content and theme of the video. "
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects. "
    "3. Actions, events, behaviors temporal relationships, physical "
    "movement changes of the objects. "
    "4. background environment, light, style and atmosphere. "
    "5. camera angles, movements, and transitions used in the video.")


def extract_glyph_texts(prompt: str) -> str | None:
    """Quoted-substring glyph extraction (reference hunyuan15.py:27-44)."""
    pattern = r"\"(.*?)\"|“(.*?)”"
    matches = re.findall(pattern, prompt)
    result = [m[0] or m[1] for m in matches]
    if len(result) > 1:
        result = list(dict.fromkeys(result))
    if not result:
        return None
    return ". ".join(f'Text "{t}"' for t in result) + ". "


def qwen_preprocess_text(prompt: str) -> str:
    return f"{PROMPT_TEMPLATE_ENCODE_VIDEO}\n{prompt or ' '}"


def qwen_postprocess_text(outputs):
    """Hidden state -3, system template cropped (reference :70-75)."""
    assert outputs.hidden_states is not None, \
        "qwen encoder must run with output_hidden_states=True"
    hs = outputs.hidden_states[-3]
    return hs[:, PROMPT_TEMPLATE_TOKEN_LENGTH:]


def byt5_preprocess_text(prompt: str) -> str:
    return extract_glyph_texts(prompt) or ""


def byt5_postprocess_text(outputs):
    return outputs.last_hidden_state


def _text_encoder_configs():
    from fastvideo_tpu.configs.models.encoders.t5 import T5Config
    from fastvideo_tpu.models.encoders.qwen2_5 import Qwen2Config

    return (Qwen2Config(), T5Config())


def _vae_config():
    from fastvideo_tpu.models.vaes.hunyuan15 import Hunyuan15VAEConfig

    return Hunyuan15VAEConfig()


@dataclasses.dataclass
class Hunyuan15T2V480PConfig(PipelineConfig):
    """HunyuanVideo-1.5 T2V (reference Hunyuan15T2V480PConfig)."""

    dit_config: HunyuanVideo15Config = dataclasses.field(
        default_factory=HunyuanVideo15Config)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_text_encoder_configs)
    preprocess_text_funcs: tuple = (qwen_preprocess_text,
                                    byt5_preprocess_text)
    postprocess_text_funcs: tuple = (qwen_postprocess_text,
                                     byt5_postprocess_text)
    # Qwen: 1000 text tokens + 108 template tokens; ByT5 glyph stream: 256
    text_encoder_max_lengths: tuple = (1000 + PROMPT_TEMPLATE_TOKEN_LENGTH,
                                       256)
    text_encoder_extra_kwargs: tuple = ({"output_hidden_states": True}, {})
    text_encoder_precisions: tuple = ("bf16", "fp32")

    flow_shift: float = 5.0
    precision: str = "bf16"
    vae_precision: str = "bf16"


@dataclasses.dataclass
class Hunyuan15T2V720PConfig(Hunyuan15T2V480PConfig):
    """720p preset: higher shift (reference hunyuan15.py:128-133)."""

    flow_shift: float = 9.0


@dataclasses.dataclass
class Hunyuan15I2V480PConfig(Hunyuan15T2V480PConfig):
    """I2V task: SigLIP image embeds + latent-channel condition concat."""

    i2v_task: bool = True


@dataclasses.dataclass
class Hunyuan15I2V720PConfig(Hunyuan15I2V480PConfig):
    """720p I2V (reference hunyuan15.py:136-141)."""

    flow_shift: float = 7.0


@dataclasses.dataclass
class Hunyuan15SR1080PConfig(Hunyuan15T2V480PConfig):
    """Two-pass SR preset (reference hunyuan15.py:144-153): base denoise
    at 720p (shift 7), SR refinement pass at shift 2 on transformer_2
    conditioned on the upsampled low-res latents."""

    flow_shift: float = 7.0
    flow_shift_sr: float = 2.0
    upsampler_precision: str = "fp32"
