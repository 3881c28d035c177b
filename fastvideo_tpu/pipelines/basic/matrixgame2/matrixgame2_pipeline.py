"""Matrix-Game 2.0 I2V pipeline.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/
matrixgame2/matrixgame2_i2v_pipeline.py (:18-68): Wan I2V stage topology
(CLIP image tokens + mask/first-frame VAE concat) over the action-
conditioned Matrix-Game transformer; keyboard/mouse sequences ride
batch.extra into the jitted denoise step.
"""

from __future__ import annotations

import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.basic.wan.wan_pipeline import (
    WanImageToVideoPipeline)
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage


class MatrixGame2ActionStage(PipelineStage):
    """Normalise extra['keyboard_cond'] / extra['mouse_cond'] to
    [B, num_frames, dims] float arrays (default: idle actions)."""

    def __init__(self, keyboard_dim: int = 4, mouse_dim: int = 2):
        self.keyboard_dim = keyboard_dim
        self.mouse_dim = mouse_dim

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        f = int(batch.num_frames)
        kb = batch.extra.get("keyboard_cond")
        if kb is None:
            kb = np.zeros((1, f, self.keyboard_dim), np.float32)
        else:
            kb = np.asarray(kb, np.float32)
            if kb.ndim == 2:
                kb = kb[None]
        mouse = batch.extra.get("mouse_cond")
        if mouse is None:
            # idle mouse (zeros), like the keyboard default — otherwise
            # the DiT silently skips its mouse-attention branch and the
            # conditioning topology no longer matches the checkpoint
            mouse = np.zeros((1, f, self.mouse_dim), np.float32)
        else:
            mouse = np.asarray(mouse, np.float32)
            if mouse.ndim == 2:
                mouse = mouse[None]
        batch.extra["mouse_cond"] = mouse[:, :f]
        batch.extra["keyboard_cond"] = kb[:, :f]
        if not batch.prompt_embeds:
            # Matrix-Game 2.0 has no text stream; the transformer swaps in
            # CLIP image tokens as context (reference
            # MatrixGame2TimeImageEmbedding:76-89)
            import jax.numpy as jnp

            batch.prompt_embeds.append(jnp.zeros((1, 1, 8), jnp.float32))
        return batch


class MatrixGame2I2VPipeline(WanImageToVideoPipeline):
    _required_config_modules = [
        "vae", "transformer", "scheduler", "image_encoder"
    ]

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        from fastvideo_tpu.pipelines.stages.image_encoding import (
            ImageEncodingStage, WanImageVAEEncodingStage)
        from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
        from fastvideo_tpu.pipelines.stages.denoising import DenoisingStage
        from fastvideo_tpu.pipelines.stages.input_validation import (
            InputValidationStage)
        from fastvideo_tpu.pipelines.stages.latent_preparation import (
            LatentPreparationStage)
        from fastvideo_tpu.pipelines.stages.text_encoding import (
            TextEncodingStage)
        from fastvideo_tpu.pipelines.stages.timestep_preparation import (
            TimestepPreparationStage)

        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        if self.get_module("text_encoder") is not None:
            self.add_stage(
                "prompt_encoding_stage",
                TextEncodingStage(
                    text_encoders=[self.get_module("text_encoder")],
                    tokenizers=[self.get_module("tokenizer")],
                    postprocess_funcs=cfg.postprocess_text_funcs,
                ))
        self.add_stage("image_encoding_stage",
                       ImageEncodingStage(self.get_module("image_encoder")))
        self.add_stage("timestep_preparation_stage",
                       TimestepPreparationStage(self.get_module("scheduler"),
                                                cfg))
        self.add_stage("latent_preparation_stage",
                       LatentPreparationStage(self.get_module("scheduler"),
                                              self.get_module("transformer"),
                                              cfg.vae_config))
        self.add_stage("image_vae_encoding_stage",
                       WanImageVAEEncodingStage(self.get_module("vae"),
                                                cfg.vae_config))
        arch = cfg.dit_config.arch_config
        action = (getattr(arch, "action_config", None) or {})
        self.add_stage("action_stage",
                       MatrixGame2ActionStage(
                           keyboard_dim=action.get("keyboard_dim_in", 4),
                           mouse_dim=action.get("mouse_dim_in", 2)))
        self.add_stage("denoising_stage",
                       DenoisingStage(self.get_module("transformer"),
                                      self.get_module("scheduler"), cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


# legacy model_index alias (reference :64-68)
class MatrixGamePipeline(MatrixGame2I2VPipeline):
    pass


EntryClass = MatrixGame2I2VPipeline
