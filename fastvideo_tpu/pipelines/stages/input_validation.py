"""Input validation + seed assignment stage.

Analog of /root/reference/fastvideo/pipelines/stages/input_validation.py:
seeds are ``seed + i`` per video; noise is later drawn from **CPU torch
generators** with those seeds (input_validation.py:42) so our latents are
bitwise-identical to the reference's at a fixed seed.

Shape bucketing (TPU addition, SURVEY §7 "dynamic shapes vs jit"):
every distinct (height, width, num_frames) is a fresh XLA compilation
(~30-60 s). With ``FASTVIDEO_SHAPE_BUCKETS=1`` (or
``FastVideoArgs.shape_bucketing``) requests snap to a canonical grid —
spatial to multiples of 64, frames to the causal-VAE 4k+1 lattice — so
a serving replica converges onto a handful of compiled programs instead
of one per client whim. Snaps are logged; exact shapes stay available
with bucketing off.
"""

from __future__ import annotations

from fastvideo_tpu import envs
from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import (PipelineStage,
                                                 StageVerificationError)

logger = init_logger(__name__)


def snap_shape_to_bucket(height: int, width: int,
                         num_frames: int | None,
                         spatial_step: int = 64,
                         frame_step: int = 4
                         ) -> tuple[int, int, int | None]:
    """Nearest canonical shape: h/w to ``spatial_step`` multiples (min
    one step), frames to the 4k+1 lattice of the causal VAEs."""
    h = max(spatial_step, round(height / spatial_step) * spatial_step)
    w = max(spatial_step, round(width / spatial_step) * spatial_step)
    f = num_frames
    if f is not None and f > 1:
        f = max(1, round((f - 1) / frame_step)) * frame_step + 1
    return h, w, f


class InputValidationStage(PipelineStage):
    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.seed is None:
            batch.seed = 1024
        if batch.seed < 0:
            raise StageVerificationError(f"invalid seed {batch.seed}")
        n = max(1, getattr(batch, "num_videos_per_prompt", 1))
        batch.seeds = [batch.seed + i for i in range(n)]

        if batch.height is None or batch.width is None:
            raise StageVerificationError("height/width required")
        if envs.FASTVIDEO_SHAPE_BUCKETS or \
                getattr(fastvideo_args, "shape_bucketing", False):
            h, w, f = snap_shape_to_bucket(batch.height, batch.width,
                                           batch.num_frames)
            if (h, w, f) != (batch.height, batch.width, batch.num_frames):
                logger.info(
                    "shape bucketing: %dx%dx%s -> %dx%dx%s",
                    batch.height, batch.width, batch.num_frames, h, w, f)
                batch.height, batch.width = h, w
                if batch.num_frames is not None:
                    batch.num_frames = f
        if batch.height % 8 or batch.width % 8:
            raise StageVerificationError(
                f"height/width must be divisible by 8, got "
                f"{batch.height}x{batch.width}")
        if batch.prompt is None and not batch.prompt_embeds:
            raise StageVerificationError("prompt or prompt_embeds required")
        if batch.guidance_scale > 1.0:
            batch.do_classifier_free_guidance = True
        return batch
