"""SD3.5 pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/sd35.py
(:21-75): dual CLIP (penultimate hidden state; pooled via projection) +
T5 encoding, FlowMatchEuler with resolution-dependent dynamic shifting.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.pipelines.base import PipelineConfig


def sd35_clip_postprocess(outputs):
    assert outputs.hidden_states is not None, \
        "SD3.5 CLIP embeddings need output_hidden_states=True"
    return outputs.hidden_states[-2]


def sd35_t5_postprocess(outputs):
    return outputs.last_hidden_state


def _text_encoder_configs():
    from fastvideo_tpu.configs.models.encoders.t5 import T5Config
    from fastvideo_tpu.models.encoders.clip import CLIPTextConfig

    return (CLIPTextConfig(), CLIPTextConfig(), T5Config())


def _dit_config():
    from fastvideo_tpu.models.dits.sd3 import SD3Config

    return SD3Config()


def _vae_config():
    from fastvideo_tpu.models.vaes.autoencoder_kl import AutoencoderKLConfig

    return AutoencoderKLConfig()


@dataclasses.dataclass
class SD35Config(PipelineConfig):
    dit_config: object = dataclasses.field(default_factory=_dit_config)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_text_encoder_configs)
    postprocess_text_funcs: tuple = (sd35_clip_postprocess,
                                     sd35_clip_postprocess,
                                     sd35_t5_postprocess)
    text_encoder_max_lengths: tuple = (77, 77, 256)
    text_encoder_extra_kwargs: tuple = ({"output_hidden_states": True},
                                        {"output_hidden_states": True}, {})
    text_encoder_precisions: tuple = ("fp32", "fp32", "bf16")

    precision: str = "bf16"
    vae_precision: str = "fp32"
    flow_shift: float | None = None  # dynamic shifting via mu
