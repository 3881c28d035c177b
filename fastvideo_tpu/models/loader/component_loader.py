"""Per-component checkpoint loaders (diffusers directory layout).

Analog of /root/reference/fastvideo/models/loader/component_loader.py
(:50,141,705,1023,1370): a pipeline directory contains model_index.json plus
one subdirectory per component (transformer/, vae/, text_encoder/,
tokenizer/, scheduler/); each loader reads the HF config.json, builds the
abstract (meta) module, then streams safetensors into device buffers with
the model's ``param_names_mapping`` applied.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.models.loader.safetensors_io import (iterate_safetensors,
                                                        load_json_config)
from fastvideo_tpu.models.loader.weight_utils import load_weights
from fastvideo_tpu.models.registry import (resolve_model_cls,
                                           resolve_scheduler_cls)

logger = init_logger(__name__)

PRECISION_TO_DTYPE = {
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "fp16": jnp.float16,
    "float16": jnp.float16,
}


def _maybe_quantize_transformer(dit, fastvideo_args):
    """Swap the DiT's linears for int8 when requested.

    TPU analog of the reference's FastWan-QAD quantized serving path
    (fastvideo_args.py:242 ``transformer_quant`` + TurboDiffusion int8
    GEMMs): quantization happens once at load, after weights land, so the
    scan-stacked block params carry int8 kernels + fp32 scales.
    """
    from fastvideo_tpu import envs

    spec = envs.FASTVIDEO_TRANSFORMER_QUANT or (
        getattr(fastvideo_args, "transformer_quant", None)
        if fastvideo_args is not None else None)
    if not spec:
        return dit
    from fastvideo_tpu.layers.quantization import (QuantizationConfig,
                                                   quantize_model_linears)
    from fastvideo_tpu.layers.quantization.int8 import resolve_quant_method

    method = resolve_quant_method(spec)
    count = quantize_model_linears(dit, QuantizationConfig(method=method))
    logger.info("Quantized %d transformer linears (%s)", count, method)
    return dit


def _build_arch_config(arch_cls, hf_config: dict[str, Any]):
    arch = arch_cls()
    arch.update_from_hf(hf_config)
    if hf_config.get("model_type") == "umt5" and hasattr(arch, "is_umt5"):
        arch.is_umt5 = True
    return arch


def load_model_component(component_dir: str, *,
                         precision: str = "bf16",
                         param_names_mapping: dict[str, str] | None = None,
                         model_config=None,
                         extra_init_kwargs: dict | None = None,
                         strict: bool = True,
                         arch_overrides: dict[str, Any] | None = None,
                         quantize_spec: str | None = None):
    """Generic diffusers-format component loader (transformer/vae/encoder).

    ``arch_overrides``: arch-config attributes forced after the HF config is
    applied (e.g. ``{"r_embedder": True}`` to grow the AnyFlow dual-timestep
    branch on a checkpoint that predates it).

    ``quantize_spec``: quantize-AT-LOAD (int8 aliases, see
    layers/quantization/int8.py). The module skeleton is built on the
    HOST, its Linears swapped for Int8Linear BEFORE any weight lands, and
    each checkpoint kernel is quantized in numpy so only int8 + scales
    cross host->HBM — a 9 GB bf16 UMT5-XXL loads as ~4.7 GB and HBM never
    holds the bf16 weights (vs _maybe_quantize_transformer, which
    quantizes on-device after load and briefly doubles residency).
    """
    hf_config = load_json_config(os.path.join(component_dir, "config.json"))
    class_name = hf_config.get("_class_name") or hf_config.get(
        "architectures", ["?"])[0]
    model_cls, arch_cls = resolve_model_cls(class_name)
    arch = _build_arch_config(arch_cls, hf_config)
    for k, v in (arch_overrides or {}).items():
        if not hasattr(arch, k):
            raise ValueError(f"arch_overrides: {arch_cls.__name__} has no "
                             f"field {k!r}")
        setattr(arch, k, v)
    if model_config is not None:
        # propagate checkpoint dims to the pipeline config so stages see
        # the real architecture (latent shape, text_len, ...).
        model_config.arch_config = arch
    dtype = PRECISION_TO_DTYPE[precision]
    if model_config is not None and param_names_mapping is None:
        param_names_mapping = model_config.param_names_mapping
    if quantize_spec:
        import jax

        from fastvideo_tpu.layers.quantization import (QuantizationConfig,
                                                       quantize_model_linears)
        from fastvideo_tpu.layers.quantization.int8 import (
            resolve_quant_method)

        method = resolve_quant_method(quantize_spec)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            # host-side skeleton: a big encoder's random bf16 init must
            # never touch HBM
            model = model_cls(arch, param_dtype=dtype, rngs=nnx.Rngs(0),
                              **(extra_init_kwargs or {}))
            count = quantize_model_linears(
                model, QuantizationConfig(method=method), init_only=True)
        n = load_weights(model, iterate_safetensors(component_dir),
                         param_names_mapping, dtype=dtype, strict=strict)
        _device_put_host_leaves(model)
        logger.info(
            "Loaded %d tensors for %s from %s (%d linears %s at load)", n,
            class_name, component_dir, count, method)
        return model
    model = model_cls(arch, param_dtype=dtype, rngs=nnx.Rngs(0),
                      **(extra_init_kwargs or {}))
    n = load_weights(model, iterate_safetensors(component_dir),
                     param_names_mapping, dtype=dtype, strict=strict)
    logger.info("Loaded %d tensors for %s from %s", n, class_name,
                component_dir)
    return model


def _device_put_host_leaves(model) -> None:
    """Move any still-host-resident variables to the default device.

    After a host-skeleton quantized load, every checkpoint tensor already
    landed on device via ``jnp.asarray``; only variables ABSENT from the
    checkpoint (none, for complete checkpoints) would remain on CPU and
    silently re-transfer on every call."""
    import jax

    default = jax.devices()[0]
    if default.platform == "cpu":
        return
    moved = 0
    for _, var in nnx.iter_graph(model):
        if isinstance(var, nnx.Variable):
            val = var.value
            if (hasattr(val, "devices")
                    and any(d.platform == "cpu" for d in val.devices())):
                var.value = jax.device_put(val, default)
                moved += 1
    if moved:
        logger.info("Moved %d host-resident variables to %s", moved, default)


def load_scheduler(component_dir: str, pipeline_config=None):
    cfg = load_json_config(
        os.path.join(component_dir, "scheduler_config.json"))
    class_name = cfg.pop("_class_name", "FlowMatchEulerDiscreteScheduler")
    cfg.pop("_diffusers_version", None)
    sched_cls = resolve_scheduler_cls(class_name)
    import inspect

    valid = set(inspect.signature(sched_cls.__init__).parameters)
    kwargs = {k: v for k, v in cfg.items() if k in valid}
    scheduler = sched_cls(**kwargs)
    if pipeline_config is not None and pipeline_config.flow_shift is not None:
        scheduler.set_shift(pipeline_config.flow_shift)
    return scheduler


def load_tokenizer(component_dir: str):
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(component_dir)
    except Exception as e:  # pragma: no cover
        logger.warning("Tokenizer load failed (%s); text encoding will "
                       "require pre-tokenized input", e)
        return None


@dataclasses.dataclass
class LoadedPipelineModules:
    modules: dict[str, Any]

    def __getitem__(self, key: str):
        return self.modules[key]

    def get(self, key: str, default=None):
        return self.modules.get(key, default)


class PipelineComponentLoader:
    """Dispatch table over component types (reference component_loader.py:1370)."""

    @staticmethod
    def load_module(module_name: str, component_dir: str, pipeline_config,
                    fastvideo_args=None):
        if module_name in ("transformer", "transformer_2"):
            cfg = pipeline_config.dit_config
            if module_name == "transformer_2":
                import copy

                # the SR / second expert may have a different architecture
                # (e.g. hy1.5 SR in_channels): don't clobber the primary
                # dit_config's arch with it.
                cfg = copy.copy(cfg)
            dit = load_model_component(
                component_dir, precision=pipeline_config.precision,
                model_config=cfg)
            return _maybe_quantize_transformer(dit, fastvideo_args)
        if module_name == "vae":
            cfg = pipeline_config.vae_config
            return load_model_component(
                component_dir, precision=pipeline_config.vae_precision,
                model_config=cfg)
        if module_name in ("text_encoder", "text_encoder_2",
                           "text_encoder_3"):
            idx = 0 if module_name == "text_encoder" else (
                int(module_name.rsplit("_", 1)[-1]) - 1)
            cfgs = pipeline_config.text_encoder_configs
            cfg = cfgs[idx] if idx < len(cfgs) else None
            precision = (pipeline_config.text_encoder_precisions[idx]
                         if idx < len(pipeline_config.text_encoder_precisions)
                         else "fp32")
            from fastvideo_tpu import envs

            quant = envs.FASTVIDEO_TEXT_ENCODER_QUANT or (
                getattr(fastvideo_args, "text_encoder_quant", None)
                if fastvideo_args is not None else None)
            return load_model_component(component_dir, precision=precision,
                                        model_config=cfg,
                                        quantize_spec=quant)
        if module_name.startswith("tokenizer"):
            return load_tokenizer(component_dir)
        if module_name == "scheduler":
            return load_scheduler(component_dir, pipeline_config)
        if module_name == "image_encoder":
            return load_model_component(
                component_dir, precision="fp32",
                model_config=pipeline_config.image_encoder_config)
        if module_name == "image_processor":
            return None
        if module_name == "conditioner":
            # Stable Audio multi-conditioner: T5 weights + tokenizer live
            # inside the component dir (zero-egress; the reference's
            # ConditionerLoader pulls t5-base from the hub).
            cond = load_model_component(
                component_dir, precision=pipeline_config.precision)
            tok_dir = os.path.join(component_dir, "tokenizer")
            if os.path.isdir(tok_dir):
                cond.tokenizer = load_tokenizer(tok_dir)
            return cond
        if module_name == "audio_vae":
            cfg = getattr(pipeline_config, "audio_vae_config", None)
            return load_model_component(component_dir, precision="fp32",
                                        model_config=cfg)
        if module_name == "audio_scheduler":
            return load_scheduler(component_dir)
        if module_name == "processor":
            # HF multimodal processor (Qwen3-VL image preprocessing for
            # MiniMax-H3 keyframes); optional — text-only requests never
            # touch it.
            try:
                from transformers import AutoProcessor

                return AutoProcessor.from_pretrained(component_dir)
            except Exception as e:  # pragma: no cover
                logger.warning("Processor load failed (%s); image keyframe "
                               "conditioning unavailable", e)
                return None
        if module_name == "upsampler":
            # hy1.5 latent SR refiners (reference component_loader.py
            # UpsamplerLoader); plain-dataclass configs, fp32 weights.
            from fastvideo_tpu.models.upsamplers import hunyuan15 as ups

            hf = dict(load_json_config(
                os.path.join(component_dir, "config.json")))
            cls_name = hf.pop("_class_name", "SRTo720pUpsampler")
            model_cls = getattr(ups, cls_name)
            cfg_cls = getattr(ups, cls_name + "Config")
            valid = {f.name for f in dataclasses.fields(cfg_cls)}
            cfg = cfg_cls(**{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in hf.items() if k in valid})
            model = model_cls(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
            n = load_weights(model, iterate_safetensors(component_dir),
                             ups.HY15_UPSAMPLER_PARAM_NAMES_MAPPING,
                             dtype=jnp.float32)
            logger.info("Loaded %d tensors for %s from %s", n, cls_name,
                        component_dir)
            return model
        if module_name in ("spatial_upsampler", "latent_upsampler"):
            # LTX-2 refine-stage latent upsampler (checkpoint dirs
            # 'spatial_upscaler' / 'spatial_upsampler')
            from fastvideo_tpu.models.upsamplers.ltx2_upsampler import (
                LTX2UpsamplerConfig)

            return load_model_component(component_dir, precision="fp32",
                                        model_config=LTX2UpsamplerConfig())
        if module_name == "vocoder":
            return load_model_component(component_dir, precision="fp32")
        raise ValueError(f"Unknown pipeline module {module_name!r}")
