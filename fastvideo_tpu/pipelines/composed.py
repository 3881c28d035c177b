"""ComposedPipelineBase: module loading + stage composition.

Analog of /root/reference/fastvideo/pipelines/composed_pipeline_base.py:31
(lifecycle: init distributed -> load modules from model_index.json ->
create_pipeline_stages -> forward iterates stages). On TPU "init
distributed" is mesh installation; there is no per-rank process fan-out —
one controller drives the whole mesh.
"""

from __future__ import annotations

import os
from typing import Any

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.models.loader.component_loader import (
    PipelineComponentLoader, load_json_config)
from fastvideo_tpu.parallel import maybe_init_mesh, mesh_context
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage

logger = init_logger(__name__)


class ComposedPipelineBase:
    # Modules that must exist in the checkpoint for this pipeline
    # (reference: _required_config_modules, basic/wan/wan_pipeline.py:19-60).
    _required_config_modules: list[str] = []

    def __init__(self, model_path: str, fastvideo_args: FastVideoArgs,
                 required_config_modules: list[str] | None = None,
                 loaded_modules: dict[str, Any] | None = None):
        self.model_path = model_path
        self.fastvideo_args = fastvideo_args
        self.pipeline_config = fastvideo_args.pipeline_config
        if required_config_modules is not None:
            self._required_config_modules = required_config_modules
        self.modules: dict[str, Any] = {}
        self._stages: list[PipelineStage] = []
        self._stage_name_mapping: dict[str, PipelineStage] = {}

        self.mesh = maybe_init_mesh(fastvideo_args.mesh_config())
        with mesh_context(self.mesh):
            self.load_modules(loaded_modules or {})
            self.initialize_pipeline(fastvideo_args)
            self.create_pipeline_stages(fastvideo_args)

    # -- module loading ----------------------------------------------------

    def load_modules(self, loaded_modules: dict[str, Any]) -> None:
        index_path = os.path.join(self.model_path, "model_index.json")
        model_index = (load_json_config(index_path)
                       if os.path.exists(index_path) else {})
        dir_map = getattr(self, "_extra_config_module_map", {})
        for name in self._required_config_modules:
            if name in loaded_modules:
                self.modules[name] = loaded_modules[name]
                continue
            dir_name = dir_map.get(name, name)
            component_dir = os.path.join(self.model_path, dir_name)
            if not os.path.isdir(component_dir) and dir_name != name:
                # checkpoint may use the plain dir name instead
                component_dir = os.path.join(self.model_path, name)
            if not os.path.isdir(component_dir):
                if name in model_index:
                    raise FileNotFoundError(
                        f"Pipeline module dir missing: {component_dir}")
                logger.warning("Optional module %s not present", name)
                continue
            self.modules[name] = PipelineComponentLoader.load_module(
                name, component_dir, self.pipeline_config,
                self.fastvideo_args)
        self._settle_uploads()
        logger.info("Loaded pipeline modules: %s", sorted(self.modules))

    def _settle_uploads(self) -> None:
        """Block until every loaded parameter is RESIDENT on device.

        device_put is async: on a remote-attached TPU the weight uploads
        stream in the background and the FIRST program execution blocks on
        the backlog — measured round 4 as "TextEncoding 142 s" that was
        actually ~4.6 GB of queued H2D, not compile. Settling here keeps
        that cost inside the (separately reported) load phase. Cost on a
        local-PCIe host: one tiny fetch per component, microseconds."""
        import jax

        from flax import nnx

        import jax.numpy as jnp

        for name, module in self.modules.items():
            if not isinstance(module, nnx.Module):
                continue
            leaves = [x for x in jax.tree.leaves(nnx.state(module))
                      if hasattr(x, "shape") and hasattr(x, "dtype")
                      and jnp.issubdtype(x.dtype, jnp.number)]
            if not leaves:
                continue
            # one tiny program consuming 1 element of EVERY leaf: its
            # execution cannot start until all inputs are resident, and a
            # single scalar fetch (1 tunnel RTT) confirms completion
            probe = jax.jit(lambda *ls: sum(
                jnp.ravel(leaf)[0].astype(jnp.float32) for leaf in ls))
            jax.device_get(probe(*leaves))

    def get_module(self, name: str, default=None):
        return self.modules.get(name, default)

    # -- stage composition -------------------------------------------------

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        pass

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        raise NotImplementedError

    def add_stage(self, stage_name: str, stage: PipelineStage) -> None:
        self._stages.append(stage)
        self._stage_name_mapping[stage_name] = stage
        setattr(self, stage_name, stage)

    @property
    def stages(self) -> list[PipelineStage]:
        return self._stages

    # -- execution ---------------------------------------------------------

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        from fastvideo_tpu import envs
        trace = envs.FASTVIDEO_TRACE_ACTIVATIONS
        with mesh_context(self.mesh):
            for stage in self._stages:
                batch = stage(batch, fastvideo_args)
                if trace:
                    from fastvideo_tpu.hooks import trace_batch
                    trace_batch(stage.name, batch)
        return batch
