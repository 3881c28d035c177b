"""MiniMax H3 packed-document layout builder (pure numpy).

Behavioral reference: /root/reference/fastvideo/pipelines/basic/
minimax_h3/packing.py (:17-268): the joint text/audio/video document is
``[text | keyframe-condition video rows | audio rows | video rows]``;
temporal rope positions advance by a per-latent frame-span pattern
(1,4,4,4,4 frames x 5/3 rescale) starting after the text tokens; spatial
positions are area-normalized fractional grids scaled by 32; audio rows
carry the stereo channel in the width coordinate (first/last column).
"""

from __future__ import annotations

import dataclasses

import numpy as np

MINIMAX_H3_VIDEO_TAG = 0
MINIMAX_H3_TEXT_TAG = 1
MINIMAX_H3_AUDIO_TAG = 2

MINIMAX_H3_FPS = 24
MINIMAX_H3_SHORT_EDGE = 768
MINIMAX_H3_MAX_PIXELS = 768 * 1344
MINIMAX_H3_CANVAS_MULTIPLE = 32
MINIMAX_H3_MIN_ASPECT_RATIO = 1 / 4
MINIMAX_H3_MAX_ASPECT_RATIO = 4
MINIMAX_H3_FRAMES_PER_CHUNK = 17
MINIMAX_H3_LATENTS_PER_CHUNK = 5
MINIMAX_H3_AUDIO_LATENTS_PER_SECOND = 40
MINIMAX_H3_AUDIO_CHANNELS = 2
MINIMAX_H3_ROPE_FRAME_RESCALE = 5.0 / 3.0
MINIMAX_H3_ROPE_FRAMES_PER_LATENT = (1, 4, 4, 4, 4)
_ROPE_SPATIAL_SCALE = 32
MINIMAX_H3_MIN_DURATION = 5.0
MINIMAX_H3_MAX_DURATION = 15.0
MINIMAX_H3_KEYFRAME_NOISE_AUG = 0.999
MINIMAX_H3_KEYFRAME_ENCODE_SEED = 42
MINIMAX_H3_VISION_START_TOKEN = "<|vision_start|>"
MINIMAX_H3_IMAGE_PAD_TOKEN = "<|image_pad|>"
MINIMAX_H3_VISION_END_TOKEN = "<|vision_end|>"
MINIMAX_H3_TEXT_ENCODER_LAYER = 50


@dataclasses.dataclass(frozen=True)
class MiniMaxH3PackedLayout:
    sequence_length: int
    position_ids: np.ndarray
    token_tags: np.ndarray
    video_indices: np.ndarray
    audio_indices: np.ndarray
    text_indices: np.ndarray
    num_condition_video_rows: int
    num_condition_audio_rows: int
    num_video_latent_frames: int
    latent_height: int
    latent_width: int
    num_audio_latents: int


def resolve_canvas_size(aspect_width: float,
                        aspect_height: float) -> tuple[int, int]:
    """(reference :66-80): short-edge-768, max-pixel clamp, 32-multiple."""
    assert aspect_width > 0 and aspect_height > 0
    ratio = aspect_width / aspect_height
    assert MINIMAX_H3_MIN_ASPECT_RATIO <= ratio <= MINIMAX_H3_MAX_ASPECT_RATIO
    if ratio >= 1:
        width, height = MINIMAX_H3_SHORT_EDGE * ratio, float(
            MINIMAX_H3_SHORT_EDGE)
    else:
        width, height = float(MINIMAX_H3_SHORT_EDGE), \
            MINIMAX_H3_SHORT_EDGE / ratio
    area = width * height
    if area > MINIMAX_H3_MAX_PIXELS:
        scale = (MINIMAX_H3_MAX_PIXELS / area)**0.5
        width, height = width * scale, height * scale
    m = MINIMAX_H3_CANVAS_MULTIPLE
    return max(m, round(height / m) * m), max(m, round(width / m) * m)


def align_num_frames(num_frames: int) -> int:
    assert num_frames >= 1
    while num_frames % MINIMAX_H3_FRAMES_PER_CHUNK != \
            MINIMAX_H3_LATENTS_PER_CHUNK:
        num_frames += 1
    return num_frames


def video_latent_num_frames(num_frames: int) -> int:
    assert num_frames % MINIMAX_H3_FRAMES_PER_CHUNK == \
        MINIMAX_H3_LATENTS_PER_CHUNK
    return (num_frames - MINIMAX_H3_LATENTS_PER_CHUNK) // \
        MINIMAX_H3_FRAMES_PER_CHUNK * MINIMAX_H3_LATENTS_PER_CHUNK + 2


def audio_latent_num_frames(num_frames: int) -> int:
    return int(round(num_frames / MINIMAX_H3_FPS *
                     MINIMAX_H3_AUDIO_LATENTS_PER_SECOND))


def patchify_video_latents(latents: np.ndarray,
                           patch_size: tuple[int, int, int]) -> np.ndarray:
    """[B, C, T, H, W] -> [rows, C*pt*ph*pw], channel-major features
    (reference :114-131)."""
    pt, ph, pw = patch_size
    b, c, t, h, w = latents.shape
    x = latents.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(-1, c * pt * ph * pw)


def unpatchify_video_tokens(rows: np.ndarray, num_latent_frames: int,
                            latent_height: int, latent_width: int,
                            channels: int,
                            patch_size: tuple[int, int, int]) -> np.ndarray:
    pt, ph, pw = patch_size
    x = rows.reshape(-1, num_latent_frames // pt, latent_height // ph,
                     latent_width // pw, channels, pt, ph, pw)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(-1, channels, num_latent_frames, latent_height,
                     latent_width)


def unpack_audio_tokens(rows: np.ndarray,
                        num_audio_latents: int) -> np.ndarray:
    x = rows.reshape(MINIMAX_H3_AUDIO_CHANNELS, num_audio_latents,
                     rows.shape[-1])
    return x.transpose(0, 2, 1)


def spatial_position_grid(dim: int, patch: int,
                          sqrt_area: float) -> np.ndarray:
    ratio = dim / sqrt_area
    left = (1.0 - ratio) / 2.0
    return np.linspace(left, left + ratio, dim // patch,
                       endpoint=False) * _ROPE_SPATIAL_SCALE


def temporal_position_grid(num_latent_frames: int,
                           origin: float) -> np.ndarray:
    spans = np.asarray([
        MINIMAX_H3_ROPE_FRAME_RESCALE * MINIMAX_H3_ROPE_FRAMES_PER_LATENT[
            i % len(MINIMAX_H3_ROPE_FRAMES_PER_LATENT)]
        for i in range(num_latent_frames)
    ], np.float64)
    return origin + np.concatenate([[0.0], np.cumsum(spans[:-1])])


def _temporal_position_span(num_latent_frames: int) -> float:
    spans = np.ones(num_latent_frames, np.float64) * \
        MINIMAX_H3_ROPE_FRAME_RESCALE
    for i, frames in enumerate(MINIMAX_H3_ROPE_FRAMES_PER_LATENT):
        spans[i::len(MINIMAX_H3_ROPE_FRAMES_PER_LATENT)] *= frames
    return float(spans.sum())


def build_row_timesteps(
        layout: MiniMaxH3PackedLayout, video_timestep: float,
        audio_timestep: float, condition_video_timestep: float,
        condition_audio_timestep: float) -> tuple[np.ndarray, np.ndarray]:
    """Per-row timesteps compressed to (unique, inverse) for the row-indexed
    AdaLN table (reference :459-470)."""
    row = np.full(layout.sequence_length, video_timestep, np.float32)
    row[layout.video_indices[:layout.num_condition_video_rows]] = \
        condition_video_timestep
    row[layout.audio_indices[layout.num_condition_audio_rows:]] = \
        audio_timestep
    row[layout.audio_indices[:layout.num_condition_audio_rows]] = \
        condition_audio_timestep
    return np.unique(row, return_inverse=True)


def build_packed_sequence(
        text_token_tags: np.ndarray, num_latent_frames: int,
        latent_height: int, latent_width: int, num_audio_latents: int,
        patch_size: tuple[int, int, int],
        keyframe_anchors: tuple[str, ...] = ()) -> MiniMaxH3PackedLayout:
    """(reference :190-268)."""
    text_token_tags = np.asarray(text_token_tags)
    assert text_token_tags.ndim == 1
    assert np.isin(text_token_tags,
                   [MINIMAX_H3_TEXT_TAG, MINIMAX_H3_VIDEO_TAG]).all()

    _, ph, pw = patch_size
    rows_per_frame = (latent_height // ph) * (latent_width // pw)
    n_text = int(text_token_tags.shape[0])
    n_cond = len(keyframe_anchors) * rows_per_frame
    n_audio = num_audio_latents * MINIMAX_H3_AUDIO_CHANNELS
    n_video = num_latent_frames * rows_per_frame
    seq = n_text + n_cond + n_audio + n_video

    cond_start = n_text
    audio_start = cond_start + n_cond
    video_start = audio_start + n_audio
    pos = np.zeros((seq, 3), np.float64)
    pos[:n_text, 0] = np.arange(n_text, dtype=np.float64)

    sqrt_area = np.sqrt(latent_height * latent_width)
    hg = spatial_position_grid(latent_height, ph, sqrt_area)
    wg = spatial_position_grid(latent_width, pw, sqrt_area)
    frame_grid = np.stack([a.reshape(-1) for a in
                           np.meshgrid(hg, wg, indexing="ij")], -1)

    for i, anchor in enumerate(keyframe_anchors):
        if anchor == "first":
            anchor_time = float(n_text)
        elif anchor == "last":
            anchor_time = (float(n_text) +
                           _temporal_position_span(num_latent_frames) -
                           MINIMAX_H3_ROPE_FRAME_RESCALE)
        else:
            raise ValueError(f"keyframe anchor must be first/last: {anchor}")
        rows = slice(cond_start + i * rows_per_frame,
                     cond_start + (i + 1) * rows_per_frame)
        pos[rows, 0] = anchor_time
        pos[rows, 1:] = frame_grid

    audio_time = float(n_text) + np.arange(num_audio_latents,
                                           dtype=np.float64)
    pos[audio_start:video_start, 0] = np.tile(audio_time,
                                              MINIMAX_H3_AUDIO_CHANNELS)
    pos[audio_start:video_start, 2] = np.concatenate([
        np.full(num_audio_latents, wg[0]),
        np.full(n_audio - num_audio_latents, wg[-1]),
    ])

    vpos = np.empty((num_latent_frames, rows_per_frame, 3), np.float64)
    vpos[:, :, 0] = temporal_position_grid(num_latent_frames,
                                           float(n_text))[:, None]
    vpos[:, :, 1:] = frame_grid[None]
    pos[video_start:] = vpos.reshape(-1, 3)

    video_indices = np.concatenate([np.arange(cond_start, audio_start),
                                    np.arange(video_start, seq)])
    audio_indices = np.arange(audio_start, video_start)
    text_indices = np.arange(n_text)
    tags = np.empty(seq, np.int64)
    tags[text_indices] = text_token_tags.astype(np.int64)
    tags[audio_indices] = MINIMAX_H3_AUDIO_TAG
    tags[video_indices] = MINIMAX_H3_VIDEO_TAG
    return MiniMaxH3PackedLayout(
        sequence_length=seq, position_ids=pos, token_tags=tags,
        video_indices=video_indices, audio_indices=audio_indices,
        text_indices=text_indices, num_condition_video_rows=n_cond,
        num_condition_audio_rows=0,
        num_video_latent_frames=num_latent_frames,
        latent_height=latent_height, latent_width=latent_width,
        num_audio_latents=num_audio_latents)
