"""LoRA pipeline mixin: convert linears, load/swap/merge adapters.

Analog of /root/reference/fastvideo/pipelines/lora_pipeline.py:95-460.
Adapter checkpoints are safetensors with diffusers/official naming; keys run
through the model's lora_param_names_mapping then param_names_mapping to
find the target Linear.
"""

from __future__ import annotations

import os
import re

import numpy as np
from flax import nnx

from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.lora import LoRALinear
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.models.loader.weight_utils import apply_param_mapping

logger = init_logger(__name__)

DEFAULT_TARGET_MODULES = ("to_q", "to_k", "to_v", "to_out", "add_k_proj",
                          "add_v_proj", "fc_in", "fc_out")


def convert_to_lora_layers(model: nnx.Module,
                           target_modules=DEFAULT_TARGET_MODULES,
                           rank: int = 16,
                           alpha: float | None = None) -> int:
    """Replace matching Linear submodules with LoRALinear in place."""
    count = 0

    def walk(mod):
        nonlocal count
        for name, child in list(vars(mod).items()):
            name = str(name)
            if name.startswith("_"):
                continue
            if isinstance(child, LoRALinear):
                continue
            if isinstance(child, Linear) and name in target_modules:
                setattr(mod, name,
                        LoRALinear.from_linear(child, rank=rank, alpha=alpha))
                count += 1
            elif isinstance(child, (nnx.Module, list, nnx.List)):
                items = child if isinstance(child,
                                            (list, nnx.List)) else [child]
                for item in items:
                    if isinstance(item, nnx.Module):
                        walk(item)

    walk(model)
    logger.info("Converted %d linears to LoRA", count)
    return count


def _resolve_lora_target(model: nnx.Module, path: str):
    obj = model
    for part in path.split("."):
        if part.isdigit():
            obj = obj[int(part)]
        else:
            obj = getattr(obj, part, None)
        if obj is None:
            return None
    return obj


class LoRAPipelineMixin:
    """Adds set_lora_adapter / merge / unmerge to a pipeline."""

    lora_adapters: dict[str, str]

    def _lora_init(self) -> None:
        if not hasattr(self, "lora_adapters"):
            self.lora_adapters = {}
            self.current_adapter: str | None = None

    def _lora_layers(self) -> list[LoRALinear]:
        out: list[LoRALinear] = []

        def walk(mod):
            for name, child in vars(mod).items():
                if str(name).startswith("_"):
                    continue
                if isinstance(child, LoRALinear):
                    out.append(child)
                elif isinstance(child, (nnx.Module, list, nnx.List)):
                    items = child if isinstance(child,
                                                (list, nnx.List)) else [child]
                    for item in items:
                        if isinstance(item, nnx.Module):
                            walk(item)

        walk(self.get_module("transformer"))
        return out

    def set_lora_adapter(self, lora_nickname: str,
                         lora_path: str | None = None) -> None:
        """Load a safetensors LoRA and attach it (reference :296)."""
        self._lora_init()
        transformer = self.get_module("transformer")
        if lora_path is None:
            lora_path = self.lora_adapters.get(lora_nickname)
        if lora_path is None:
            raise ValueError(f"Unknown LoRA {lora_nickname!r}")
        self.lora_adapters[lora_nickname] = lora_path

        from safetensors import safe_open

        path = lora_path
        if os.path.isdir(path):
            cands = [f for f in os.listdir(path)
                     if f.endswith(".safetensors")]
            path = os.path.join(path, cands[0])

        cfg = self.pipeline_config.dit_config
        lora_map = getattr(cfg, "lora_param_names_mapping", {})
        name_map = getattr(cfg, "param_names_mapping", {})

        pairs: dict[str, dict[str, np.ndarray]] = {}
        with safe_open(path, framework="numpy") as f:
            for key in f.keys():  # noqa: SIM118
                name = key
                for prefix in ("diffusion_model.", "transformer.",
                               "lora_unet_"):
                    if name.startswith(prefix):
                        name = name[len(prefix):]
                m = re.match(r"^(.*)\.(lora_A|lora_B|lora_down|lora_up)"
                             r"(?:\.default)?\.weight$", name)
                if not m:
                    continue
                base, which = m.group(1), m.group(2)
                which = {"lora_down": "lora_A", "lora_up": "lora_B"}[which] \
                    if which in ("lora_down", "lora_up") else which
                base = apply_param_mapping(base + ".weight", lora_map)
                base = apply_param_mapping(base, name_map)
                base = base[:-len(".weight")]
                pairs.setdefault(base, {})[which] = f.get_tensor(key)

        applied = 0
        for base, ab in pairs.items():
            if "lora_A" not in ab or "lora_B" not in ab:
                continue
            target = _resolve_lora_target(transformer, base)
            if target is None or not isinstance(target, Linear):
                logger.warning("LoRA target %s not found", base)
                continue
            if not isinstance(target, LoRALinear):
                # convert on demand
                parts = base.split(".")
                owner = _resolve_lora_target(transformer,
                                             ".".join(parts[:-1]))
                target = LoRALinear.from_linear(target)
                setattr(owner, parts[-1], target)
            # torch layouts: lora_A [r, in] -> [in, r]; lora_B [out, r] -> [r, out]
            target.set_adapter(ab["lora_A"].T, ab["lora_B"].T)
            applied += 1
        self.current_adapter = lora_nickname
        logger.info("Applied LoRA %s: %d layers", lora_nickname, applied)
        # invalidate jitted denoise fns (params structure changed)
        if hasattr(self, "denoising_stage"):
            self.denoising_stage._step_fns = {}

    def merge_lora_weights(self) -> None:
        for layer in self._lora_layers():
            layer.merge()
        if hasattr(self, "denoising_stage"):
            self.denoising_stage._step_fns = {}

    def unmerge_lora_weights(self) -> None:
        for layer in self._lora_layers():
            layer.unmerge()
        if hasattr(self, "denoising_stage"):
            self.denoising_stage._step_fns = {}
