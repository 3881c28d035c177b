"""LongCat-Video pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
longcat.py (:21-175): single UMT5 text stream (cleaned + zero-padded to
512), Wan VAE (4x8 compression), no flow shift, CFG-zero optimized
guidance in the denoising stage, optional BSA sparse attention.
"""

from __future__ import annotations

import dataclasses
import html
import re

from fastvideo_tpu.configs.models.dits.longcat import LongCatVideoConfig
from fastvideo_tpu.configs.models.vaes.wan import WanVAEConfig
from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.configs.pipelines.wan import t5_postprocess_text


def longcat_preprocess_text(prompt: str) -> str:
    """unicode fix + whitespace normalization (reference longcat.py:64-90;
    ftfy degraded to html-unescape when unavailable)."""
    text = prompt
    try:
        import ftfy

        fixed = ftfy.fix_text(text)
        if isinstance(fixed, str):  # guard against test-time ftfy stubs
            text = fixed
    except Exception:
        pass
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip()


def _text_encoder_configs():
    from fastvideo_tpu.configs.models.encoders.t5 import T5Config

    return (T5Config(),)


@dataclasses.dataclass
class LongCatT2V480PConfig(PipelineConfig):
    dit_config: LongCatVideoConfig = dataclasses.field(
        default_factory=LongCatVideoConfig)
    vae_config: WanVAEConfig = dataclasses.field(default_factory=WanVAEConfig)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_text_encoder_configs)
    preprocess_text_funcs: tuple = (longcat_preprocess_text,)
    postprocess_text_funcs: tuple = dataclasses.field(
        default_factory=lambda: (t5_postprocess_text,))
    text_encoder_precisions: tuple = ("bf16",)

    # LongCat does not use a flow shift (reference longcat.py:155)
    flow_shift: float | None = None
    precision: str = "bf16"
    vae_precision: str = "bf16"

    enable_kv_cache: bool = True
    enable_bsa: bool = False
    bsa_params: dict | None = None


@dataclasses.dataclass
class LongCatT2V704PConfig(LongCatT2V480PConfig):
    """704p preset: BSA enabled (reference longcat.py:165-175)."""

    enable_bsa: bool = True


@dataclasses.dataclass
class LongCatI2VConfig(LongCatT2V480PConfig):
    i2v_task: bool = True
