"""Maps studio workload types onto the method-plugin trainer.

Behavior analog of /root/reference/apps/fastvideo_studio/
training_config.py (:60-293): each training job becomes a YAML run
config for ``fastvideo train --config`` — here the TPU trainer's schema
(method name + model/data/training/method_config/callbacks,
training/run_config.py) instead of the reference's ``_target_`` tree.
"""

from __future__ import annotations

import os
from typing import Any

# Only T2V workflows are supported (reference :30-40).
SUPPORTED_WORKLOADS: frozenset[str] = frozenset({
    "full_t2v",       # SFT finetune
    "vsa_t2v",        # SFT with VSA sparse attention
    "ode_init",       # KD against teacher ODE trajectories
    "dmd_t2v",        # DMD2 distillation
    "self_forcing_t2v",   # causal self-forcing distillation
    "lora_t2v",       # LoRA finetune
})

DISTILL_WORKLOADS = ("dmd_t2v", "self_forcing_t2v")

_METHOD_BY_WORKLOAD = {
    "full_t2v": "sft",
    "vsa_t2v": "sft",
    "lora_t2v": "sft",
    "ode_init": "kd",
    "dmd_t2v": "dmd2",
    "self_forcing_t2v": "self_forcing",
}


def is_ltx2_model(model_path: str) -> bool:
    lower = (model_path or "").lower()
    return "ltx2" in lower or "ltx-2" in lower


def _parse_denoising_steps(raw: str | None) -> list[int]:
    """UI comma-string -> int list (reference :63-73)."""
    text = (str(raw) if raw is not None else "").strip() or "1000,757,522"
    try:
        steps = [int(p) for p in text.split(",") if p.strip()]
    except ValueError as exc:
        raise ValueError(f"Invalid DMD denoising steps {raw!r}: expected "
                         "comma-separated integers") from exc
    if not steps:
        raise ValueError(f"Invalid DMD denoising steps {raw!r}: expected "
                         "at least one integer")
    return steps


def build_training_config(job: dict[str, Any],
                          output_dir: str) -> dict[str, Any]:
    """Studio job dict -> TPU trainer run-config dict (reference :271)."""
    workload = job.get("workload_type", "full_t2v")
    if workload not in SUPPORTED_WORKLOADS:
        raise ValueError(f"Unknown workload type: {workload}. "
                         f"Supported: {sorted(SUPPORTED_WORKLOADS)}")
    model_id = job.get("model_id", "")
    if is_ltx2_model(model_id):
        raise ValueError(
            "LTX-2 training is not supported by the modular trainer. "
            "Choose a Wan-family model.")

    distill = workload in DISTILL_WORKLOADS
    lr = float(job.get("learning_rate", 5e-5) or 5e-5)

    training: dict[str, Any] = {
        "num_gpus": int(job.get("num_gpus", 1) or 1),
        "learning_rate": lr,
        "weight_decay": 1e-4,
        "max_train_steps": int(job.get("max_train_steps", 1000) or 1000),
        "gradient_accumulation_steps": int(
            job.get("gradient_accumulation_steps", 8) or 8),
        "output_dir": output_dir,
        "checkpointing_steps": 500,
        "seed": 1000,
    }
    if distill:
        training["betas"] = [0.0, 0.999]

    method_config: dict[str, Any] = {}
    dmd: dict[str, Any] = {}
    if workload == "vsa_t2v" or (distill and job.get("dmd_use_vsa")):
        # consumed via TrainingArgs.attention_backend (attention selector)
        training["attention_backend"] = "VIDEO_SPARSE_ATTN"
    if workload == "ode_init":
        method_config.update({
            "teacher_path_cache": os.path.join(output_dir, "kd_cache"),
            "t_list": [995, 937, 833, 625, 0],
            "teacher_guidance_scale": 3.5,
        })
    if distill:
        dmd = {
            "dmd_denoising_steps":
                _parse_denoising_steps(job.get("dmd_denoising_steps")),
            "real_score_guidance_scale":
                float(job.get("real_score_guidance_scale", 3.5) or 3.5),
            "dfake_gen_update_ratio":
                int(job.get("generator_update_interval", 5) or 5),
        }

    flow_shift = {"dmd_t2v": 8.0, "self_forcing_t2v": 5.0,
                  "ode_init": 5.0}.get(workload, 3.0)

    callbacks: dict[str, Any] = {
        "grad_clip": {"max_grad_norm": 1.0},
    }
    if distill:
        callbacks["ema"] = {
            "decay": 0.99 if workload == "self_forcing_t2v" else 0.98,
            "start_iter": 200 if workload == "self_forcing_t2v" else 0,
        }
    validation_prompt = job.get("validation_prompt", "")
    if validation_prompt and workload != "ode_init":
        callbacks["validation"] = {
            "prompt": validation_prompt,
            "every_n_steps": 200,
            "num_inference_steps":
                len(_parse_denoising_steps(job.get("dmd_denoising_steps")))
                if distill else 50,
        }

    cfg: dict[str, Any] = {
        "method": _METHOD_BY_WORKLOAD[workload],
        "model": {
            "pretrained_model_path": model_id,
            "dit_precision": "bf16",
            "flow_shift": flow_shift,
        },
        "data": {
            "path": job.get("data_path", ""),
            "batch_size": int(job.get("train_batch_size", 1) or 1),
            "text_drop_rate":
                0.0 if (distill or workload == "ode_init") else 0.1,
        },
        "training": training,
        "method_config": method_config,
        "callbacks": callbacks,
    }
    if dmd:
        cfg["dmd"] = dmd
    return cfg
