"""YAML-configured training entrypoint (method plugin dispatch).

Analog of /root/reference/fastvideo/train/entrypoint/train.py:120
(``torchrun -m fastvideo.train.entrypoint.train --config cfg.yaml``) —
here a single JAX controller drives the whole mesh, so the entrypoint is
plain ``python -m fastvideo_tpu.entrypoints.cli.train --config cfg.yaml``.

The ``method`` key resolves through the plugin registry
(``fastvideo_tpu.training.methods``) — a registered name (sft, dmd2,
self_forcing, kd, dfsft, ...) or a dotted ``_target_`` path to any
TrainingMethod subclass, mirroring the reference's ``_target_``
instantiation (train/utils/instantiate.py).

Config tree (parsed with the typed api parser; unknown keys are errors):

    method: sft | dmd2 | self_forcing | kd | dfsft | pkg.mod.MyMethod
    model:
      pretrained_model_path: /path/to/Diffusers-dir   # transformer/ inside
      dit_precision: bf16
    data:
      path: /path/to/parquet
      batch_size: 1
    training:                # any TrainingArgs field
      learning_rate: 1e-5
      max_train_steps: 1000
    method_config:           # free-form, passed to Method.from_config
      t_list: [999, 937, 833, 624]
"""

from __future__ import annotations

import argparse

# Back-compat re-exports: the run-config schema lives in training/run_config
# (round-1 callers imported these from here).
from fastvideo_tpu.training.run_config import (DataSpec, DMDSpec, ModelSpec,
                                               TrainRunConfig,
                                               build_dataloader,
                                               build_training_args,
                                               load_train_config)
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

__all__ = [
    "TrainRunConfig", "ModelSpec", "DataSpec", "DMDSpec",
    "load_train_config", "build_from_config", "main",
]


def build_from_config(cfg: TrainRunConfig):
    """Resolve the method plugin and build (method, dataloader)."""
    from fastvideo_tpu.training.methods import resolve_method

    method_cls = resolve_method(cfg.method)
    method = method_cls.from_config(cfg)
    dataloader = build_dataloader(cfg, method.args)
    return method, dataloader


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser("fastvideo_tpu train")
    parser.add_argument("--config", required=True,
                        help="YAML/JSON training config")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint")
    ns = parser.parse_args(argv)
    cfg = load_train_config(ns.config)
    method, dataloader = build_from_config(cfg)
    if ns.resume:
        method.resume_from_checkpoint()
    if dataloader is None:
        raise SystemExit("data.path is required to run training")
    logger.info("Starting %s training (%d steps)", cfg.method,
                method.args.max_train_steps)
    method.train(dataloader, callbacks=cfg.callbacks or None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
