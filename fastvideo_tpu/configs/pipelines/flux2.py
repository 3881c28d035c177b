"""FLUX.2 pipeline configs (full Mistral3 + Klein Qwen3 variants).

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
flux_2.py (:19-92) and pipelines/basic/flux_2/flux_2_text_encoding.py
(:15-47): a BFL chat-template prompt (flattened here to system+user text,
equivalent for text-only prompts), hidden states from three evenly spaced
layers stacked on channels -> [B, S, 3*hidden], empirical-mu flow
sigmas, embedded distilled guidance 4.0 (full) / none (Klein).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.models.dits.flux_2 import Flux2Config

FLUX2_SYSTEM_MESSAGE = (
    "You are an AI that reasons about image descriptions. You give "
    "structured responses focusing on object relationships, object\n"
    "attribution and actions without speculation.")


def flux2_preprocess_text(prompt: str) -> str:
    return f"{FLUX2_SYSTEM_MESSAGE}\n{prompt or ' '}"


def _stack_layers(outputs, layers: tuple[int, ...]):
    assert outputs.hidden_states is not None, \
        "flux2 text encoding needs output_hidden_states=True"
    # clamp for shallower-than-production encoders (tiny test checkpoints);
    # real Mistral3/Qwen3 depths make this a no-op
    last = len(outputs.hidden_states) - 1
    hs = [outputs.hidden_states[min(k, last)] for k in layers]
    stacked = jnp.stack(hs, axis=1)  # [B, L, S, D]
    b, n, s, d = stacked.shape
    return stacked.transpose(0, 2, 1, 3).reshape(b, s, n * d)


def flux2_postprocess_text(outputs):
    """Mistral3 layers (10, 20, 30) (reference flux_2.py:31,
    text_encoder_out_layers)."""
    return _stack_layers(outputs, (10, 20, 30))


def flux2_klein_postprocess_text(outputs):
    """Qwen3 layers (9, 18, 27) (reference flux_2.py:52-63)."""
    return _stack_layers(outputs, (9, 18, 27))


def _vae_config():
    from fastvideo_tpu.models.vaes.flux2 import Flux2VAEConfig

    return Flux2VAEConfig()


def _mistral_configs():
    from fastvideo_tpu.models.encoders.mistral import MistralConfig

    return (MistralConfig(),)


def _qwen3_configs():
    from fastvideo_tpu.models.encoders.qwen3 import Qwen3Config

    return (Qwen3Config(),)


@dataclasses.dataclass
class Flux2PipelineConfig(PipelineConfig):
    """Full FLUX.2: Mistral3 text stack, embedded guidance 4.0."""

    dit_config: Flux2Config = dataclasses.field(default_factory=Flux2Config)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_mistral_configs)
    preprocess_text_funcs: tuple = (flux2_preprocess_text,)
    postprocess_text_funcs: tuple = (flux2_postprocess_text,)
    text_encoder_max_lengths: tuple = (512,)
    text_encoder_extra_kwargs: tuple = ({"output_hidden_states": True},)
    text_encoder_precisions: tuple = ("bf16",)

    embedded_cfg_scale: float | None = 4.0
    precision: str = "bf16"
    vae_precision: str = "fp32"


@dataclasses.dataclass
class Flux2KleinPipelineConfig(Flux2PipelineConfig):
    """FLUX.2 Klein (distilled 4-step): Qwen3 stack, no guidance embeds."""

    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_qwen3_configs)
    postprocess_text_funcs: tuple = (flux2_klein_postprocess_text,)
    preprocess_text_funcs: tuple = ()
    embedded_cfg_scale: float | None = None
