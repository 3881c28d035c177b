"""Kandinsky-5.0 pipeline configs.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
kandinsky5.py (:20-130): Qwen2.5-VL text stream through a fixed chat
template (user content begins at token 129 — the template's typos are
LOAD-BEARING, the checkpoint was trained with them), CLIP pooled second
stream added to the time embedding, HunyuanVideo VAE, FlowMatchEuler
shift 5.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.models.dits.kandinsky5 import Kandinsky5Config

# Typos preserved verbatim (reference kandinsky5.py:20-33): the encode
# start index 129 counts tokens of THIS exact string.
KANDINSKY5_PROMPT_TEMPLATE = "\n".join([
    "<|im_start|>system\nYou are a promt engineer. Describe the video in detail.",  # codespell:ignore promt  # noqa: E501
    "Describe how the camera moves or shakes, describe the zoom and view angle, whether it follows the objects.",  # noqa: E501
    "Describe the location of the video, main characters or objects and their action.",  # noqa: E501
    "Describe the dynamism of the video and presented actions.",
    "Name the visual style of the video: whether it is a professional footage, user generated content, some kind of animation, video game or scren content.",  # codespell:ignore scren  # noqa: E501
    "Describe the visual effects, postprocessing and transitions if they are presented in the video.",  # noqa: E501
    "Pay attention to the order of key actions shown in the scene.<|im_end|>",
    "<|im_start|>user\n{}<|im_end|>",
])
KANDINSKY5_ENCODE_START_IDX = 129


def kandinsky5_qwen_preprocess_text(prompt: str) -> str:
    if not prompt.strip():
        prompt = "."
    return KANDINSKY5_PROMPT_TEMPLATE.format(prompt)


def kandinsky5_qwen_postprocess_text(outputs):
    assert outputs.hidden_states is not None, \
        "kandinsky5 qwen encoding needs output_hidden_states=True"
    hs = outputs.hidden_states[-1]
    out = hs[:, KANDINSKY5_ENCODE_START_IDX:]
    if out.shape[1] == 0:  # tiny-test prompts shorter than the template
        out = hs[:, -1:]
    return out


def kandinsky5_clip_postprocess_text(outputs):
    assert outputs.pooler_output is not None
    return outputs.pooler_output


def _text_encoder_configs():
    from fastvideo_tpu.models.encoders.clip import CLIPTextConfig
    from fastvideo_tpu.models.encoders.qwen2_5 import Qwen2Config

    return (Qwen2Config(), CLIPTextConfig())


def _vae_config():
    from fastvideo_tpu.models.vaes.hunyuan import HunyuanVAEConfig

    return HunyuanVAEConfig()


@dataclasses.dataclass
class Kandinsky5T2VConfig(PipelineConfig):
    dit_config: Kandinsky5Config = dataclasses.field(
        default_factory=Kandinsky5Config)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_text_encoder_configs)
    preprocess_text_funcs: tuple = (kandinsky5_qwen_preprocess_text,
                                    lambda p: p)
    postprocess_text_funcs: tuple = (kandinsky5_qwen_postprocess_text,
                                     kandinsky5_clip_postprocess_text)
    text_encoder_max_lengths: tuple = (KANDINSKY5_ENCODE_START_IDX + 512, 77)
    text_encoder_extra_kwargs: tuple = ({"output_hidden_states": True}, {})
    text_encoder_precisions: tuple = ("bf16", "bf16")

    flow_shift: float = 5.0
    precision: str = "bf16"
    vae_precision: str = "bf16"


@dataclasses.dataclass
class Kandinsky5I2VConfig(Kandinsky5T2VConfig):
    """I2V: visual_cond checkpoints concat [latent, cond, mask] channels."""

    i2v_task: bool = True
