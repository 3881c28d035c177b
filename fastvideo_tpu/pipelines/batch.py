"""ForwardBatch / TrainingBatch: the inter-stage data contract.

Analog of /root/reference/fastvideo/pipelines/pipeline_batch_info.py:62,283
(vLLM-style "everything in one mutable dataclass" pattern). Fields cover the
Wan family first; model-family extras ride in ``extra``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax

Array = jax.Array


@dataclasses.dataclass
class PipelineLoggingInfo:
    """Per-stage wall-time map (reference pipeline_batch_info.py:28-58)."""

    stage_times: dict[str, float] = dataclasses.field(default_factory=dict)

    def record(self, stage: str, seconds: float) -> None:
        self.stage_times[stage] = self.stage_times.get(stage, 0.0) + seconds


@dataclasses.dataclass
class ForwardBatch:
    # generation request
    prompt: str | list[str] | None = None
    negative_prompt: str | list[str] | None = None
    prompt_path: str | None = None
    output_path: str = "outputs/"
    output_video_name: str | None = None

    # text embeddings (one entry per text encoder)
    prompt_embeds: list[Array] = dataclasses.field(default_factory=list)
    negative_prompt_embeds: list[Array] = dataclasses.field(
        default_factory=list)
    prompt_attention_mask: list[Array] = dataclasses.field(
        default_factory=list)
    negative_attention_mask: list[Array] = dataclasses.field(
        default_factory=list)
    do_classifier_free_guidance: bool = False

    # video conditioning (V2V / Lucy Edit): source clip path or frames
    video_path: str | None = None

    # image conditioning (I2V / TI2V)
    image_path: str | None = None
    image_embeds: list[Array] = dataclasses.field(default_factory=list)
    image_latent: Array | None = None
    pil_image: Any = None
    preprocessed_image: Array | None = None

    # latents
    latents: Array | None = None
    raw_latent_shape: tuple[int, ...] | None = None
    noise_pred: Array | None = None
    # joint audio-video families (MiniMax-H3, LTX-2)
    audio_latents: Array | None = None
    height_latents: int | None = None
    width_latents: int | None = None
    # FL2VA last-frame conditioning + ordered Ref2VA references
    last_image: Any = None
    references: list | None = None

    # timesteps
    timesteps: Any = None
    timestep: Any = None
    num_inference_steps: int = 50

    # generation geometry
    height: int | None = None
    width: int | None = None
    num_frames: int = 1
    num_frames_round_down: bool = False
    fps: int | None = None

    # sampling
    seed: int | None = None
    seeds: list[int] | None = None
    guidance_scale: float = 1.0
    guidance_rescale: float = 0.0
    eta: float = 0.0
    sigmas: list[float] | None = None
    n_tokens: int | None = None

    # outputs
    output: Array | None = None
    return_frames: bool = False
    save_video: bool = True
    return_trajectory_latents: bool = False
    trajectory_latents: Array | None = None
    trajectory_timesteps: list | None = None

    # few-step / distilled sampling
    dmd_denoising_steps: list[int] | None = None

    # TI2V (Wan2.2 5B) expanded per-token timesteps
    ti2v_task: bool = False

    # super-resolution second pass (hy1.5 SR; reference
    # pipeline_batch_info.py:131,170-182)
    lq_latents: Array | None = None
    video_latent: Array | None = None
    height_sr: int | None = None
    width_sr: int | None = None
    num_inference_steps_sr: int = 10

    # free-form extensions
    extra: dict[str, Any] = dataclasses.field(default_factory=dict)
    logging_info: PipelineLoggingInfo = dataclasses.field(
        default_factory=PipelineLoggingInfo)

    # VSA / sparse-attention knobs
    VSA_sparsity: float = 0.0

    def __post_init__(self) -> None:
        if self.seed is not None and self.seeds is None:
            self.seeds = [self.seed]


@dataclasses.dataclass
class TrainingBatch:
    """Reference pipeline_batch_info.py:283."""

    latents: Array | None = None
    noise: Array | None = None
    noisy_model_input: Array | None = None
    timesteps: Array | None = None
    sigmas: Array | None = None
    encoder_hidden_states: Array | None = None
    encoder_attention_mask: Array | None = None
    infos: list[dict[str, Any]] | None = None
    loss: float | None = None
    grad_norm: float | None = None
    current_timestep: int = 0
    total_loss: float = 0.0
    extra: dict[str, Any] = dataclasses.field(default_factory=dict)


def _settle_batch(batch: ForwardBatch) -> None:
    """Force async-dispatched device work to finish by fetching one element
    of the most-downstream device array on the batch (block_until_ready is
    a no-op on some transports, so a host fetch is the only true sync)."""
    import jax

    for arr in (batch.output, batch.latents, *(batch.prompt_embeds or ())):
        if arr is not None and hasattr(arr, "ravel"):
            try:
                jax.device_get(arr.ravel()[:1])
            except Exception:  # non-jax array (numpy) — already settled
                pass
            return


def timed_stage(batch: ForwardBatch, name: str):
    """Context manager recording a stage's wall time into logging_info.

    With FASTVIDEO_STAGE_SYNC=1 the stage settles the device queue before
    the timer stops, so async-dispatched work lands in the right stage
    (reference analog: per-stage metrics via PipelineLoggingInfo,
    pipeline_batch_info.py:28-58)."""

    class _Timer:
        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            from fastvideo_tpu import envs
            if envs.FASTVIDEO_STAGE_SYNC:
                _settle_batch(batch)
            batch.logging_info.record(name, time.perf_counter() - self.t0)
            return False

    return _Timer()
