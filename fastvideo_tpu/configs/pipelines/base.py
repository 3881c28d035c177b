"""PipelineConfig: per-model-family pipeline configuration.

Analog of /root/reference/fastvideo/configs/pipelines/base.py:28-76 — nests
the component model configs plus denoising knobs (flow_shift, precisions,
dmd steps).
"""

from __future__ import annotations

import dataclasses
import json
from collections.abc import Callable
from typing import Any

from fastvideo_tpu.configs.models.base import ModelConfig


@dataclasses.dataclass
class PipelineConfig:
    model_path: str = ""
    pipeline_class_name: str | None = None

    dit_config: ModelConfig | None = None
    vae_config: ModelConfig | None = None
    text_encoder_configs: tuple[ModelConfig, ...] = ()
    image_encoder_config: ModelConfig | None = None
    postprocess_text_funcs: tuple[Callable, ...] = ()

    vae_tiling: bool = False
    vae_sp: bool = False

    flow_shift: float | None = None
    disable_autocast: bool = False
    dmd_denoising_steps: list[int] | None = None
    embedded_cfg_scale: float | None = None

    precision: str = "bf16"
    vae_precision: str = "fp32"
    vae_decode_precision: str = "bf16"
    text_encoder_precisions: tuple[str, ...] = ("fp32",)

    ti2v_task: bool = False
    # Lucy Edit (Wan2.2 5B video editing): [noise | video] channel concat
    # + expanded per-token timesteps (reference configs/pipelines/base.py:80)
    lucy_edit_task: bool = False
    # Wan2.2 MoE expert boundary (None = single expert)
    boundary_ratio: float | None = None

    extra: dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def model_family(self) -> str:
        """Preset-registry family key, derived from the config module
        (configs/pipelines/<family>.py). Subclasses defined elsewhere can
        override with a plain class attribute."""
        return type(self).__module__.rsplit(".", 1)[-1]

    def update_config_from_dict(self, d: dict[str, Any]) -> None:
        field_names = {f.name for f in dataclasses.fields(self)}
        for k, v in d.items():
            if k in field_names:
                setattr(self, k, v)
            else:
                self.extra[k] = v

    def dump_to_json(self, path: str) -> None:
        data = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if isinstance(getattr(self, f.name),
                          (int, float, str, bool, list, type(None)))
        }
        with open(path, "w") as fh:
            json.dump(data, fh, indent=2)
