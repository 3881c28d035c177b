"""Model-backed audio metrics: DeSync, ImageBind score, AudioBox
aesthetics.

Behavioral references:
- /root/reference/fastvideo/eval/metrics/audio/desync/metric.py
  (:28-255): Synchformer AV desynchronization — 25 fps / 224 px video
  segments of 16 frames stride 8, 16 kHz mel segments of 10240 samples
  stride 5120 (128 mels, log, (x - -4.2677)/(2*4.5690)), argmax over
  the 21-class [-2, +2] s grid for the first-14 and last-14 segments,
  score = mean |offset|; lower is better.
- audio/imagebind_score/metric.py: cosine similarity of ImageBind
  vision and audio embeddings.
- audio/audiobox_aesthetics/metric.py: PQ as the primary score with
  CE/CU/PC/PQ in details.

Zero-egress policy: the preprocessing + scoring protocol is native and
tested; the neural backbones are pluggable backends — DeSync takes any
object with ``extract_vfeats/extract_afeats/compare_v_a`` (e.g. the
MMAudio Synchformer export loaded from a local path), and the
ImageBind / AudioBox metrics gate on their pip packages exactly like
the reference.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from fastvideo_tpu.eval.base import BaseMetric
from fastvideo_tpu.eval.registry import register
from fastvideo_tpu.eval.types import MetricResult

# Synchformer constants (reference desync/metric.py:30-44)
SYNC_SIZE = 224
SYNC_FPS = 25.0
AUDIO_SR = 16000
VIDEO_SEG_FRAMES = 16
VIDEO_SEG_STEP = 8
AUDIO_SEG_SAMPLES = 10240
AUDIO_SEG_STEP = 5120
GRID_LOW, GRID_HIGH, GRID_SIZE = -2.0, 2.0, 21
NUM_SEG_PER_DIRECTION = 14
AUDIO_MEL_FRAMES = 66
AUDIO_MEAN, AUDIO_STD = -4.2677393, 4.5689974


def make_class_grid(low: float, high: float, size: int) -> np.ndarray:
    """21 uniformly spaced offsets in [-2, +2] s (Synchformer grid)."""
    return np.linspace(low, high, size).astype(np.float32)


def resample_video(frames: np.ndarray, target_fps: float,
                   src_fps: float) -> np.ndarray:
    """[T, H, W, C] nearest-neighbor temporal resample preserving the
    clip duration (reference :46-57)."""
    if abs(src_fps - target_fps) < 1e-6:
        return frames
    src_t = frames.shape[0]
    duration = src_t / src_fps
    target_t = max(VIDEO_SEG_FRAMES, int(round(duration * target_fps)))
    idx = np.clip((np.arange(target_t) * (src_fps / target_fps))
                  .astype(np.int64), 0, src_t - 1)
    return frames[idx]


def video_transform(frames: np.ndarray) -> np.ndarray:
    """Resize shortest side to 224, center-crop 224, [-1, 1]-ish
    normalize (reference _video_transform)."""
    import PIL.Image

    t, h, w, c = frames.shape
    scale = SYNC_SIZE / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    out = np.stack([
        np.asarray(PIL.Image.fromarray(
            (np.clip(f, 0, 1) * 255).astype(np.uint8)).resize(
                (nw, nh), PIL.Image.BILINEAR), np.float32) / 255.0
        for f in frames])
    top = (nh - SYNC_SIZE) // 2
    left = (nw - SYNC_SIZE) // 2
    out = out[:, top:top + SYNC_SIZE, left:left + SYNC_SIZE]
    # Synchformer preprocessing normalizes (x - 0.5) / 0.5 per channel
    # (reference desync transform), NOT ImageNet stats
    return (out - 0.5) / 0.5


def segment_video(frames: np.ndarray) -> np.ndarray:
    """[T, ...] -> [S, 16, ...] windows stride 8 (reference
    _segment_video); raises on clips shorter than one window."""
    t = frames.shape[0]
    if t < VIDEO_SEG_FRAMES:
        raise ValueError(f"clip too short for Synchformer: {t} frames "
                         f"< {VIDEO_SEG_FRAMES}")
    starts = range(0, t - VIDEO_SEG_FRAMES + 1, VIDEO_SEG_STEP)
    return np.stack([frames[s:s + VIDEO_SEG_FRAMES] for s in starts])


def segment_audio(waveform: np.ndarray) -> np.ndarray:
    """[N] 16 kHz samples -> [S, 10240] windows stride 5120."""
    n = waveform.shape[-1]
    if n < AUDIO_SEG_SAMPLES:
        raise ValueError(f"audio too short: {n} < {AUDIO_SEG_SAMPLES}")
    starts = range(0, n - AUDIO_SEG_SAMPLES + 1, AUDIO_SEG_STEP)
    return np.stack([waveform[s:s + AUDIO_SEG_SAMPLES] for s in starts])


def mel_normalize(mel: np.ndarray) -> np.ndarray:
    """log-mel -> Synchformer's AST normalization, padded/truncated to
    66 frames on the last axis (reference :120-133)."""
    x = np.log(mel + 1e-6)
    t = x.shape[-1]
    if t < AUDIO_MEL_FRAMES:
        # pad with the tensor's MIN (silence), not zeros — a 0.0 log-mel
        # normalizes to a loud frame (reference _pad_or_truncate_mel)
        pad = np.full((*x.shape[:-1], AUDIO_MEL_FRAMES - t), x.min(),
                      x.dtype)
        x = np.concatenate([x, pad], axis=-1)
    else:
        x = x[..., :AUDIO_MEL_FRAMES]
    return (x - AUDIO_MEAN) / (2 * AUDIO_STD)


def desync_from_logits(front_logits: np.ndarray, back_logits: np.ndarray,
                       grid: np.ndarray | None = None
                       ) -> tuple[float, float, float]:
    """argmax per direction -> |grid value|; score = mean
    (reference :236-247)."""
    grid = make_class_grid(GRID_LOW, GRID_HIGH, GRID_SIZE) \
        if grid is None else grid
    front = abs(float(grid[int(np.argmax(front_logits))]))
    back = abs(float(grid[int(np.argmax(back_logits))]))
    return (front + back) / 2.0, front, back


def synchformer_mel(waveform_seg: np.ndarray) -> np.ndarray:
    """[10240] 16 kHz samples -> [128, T] power mel, matching
    torchaudio's MelSpectrogram(sr=16000, win=400, hop=160, n_fft=1024,
    n_mels=128) used by the reference (:176-183); built on the repo's
    self-contained filterbank (eval/suite/audio.py) — no librosa."""
    from fastvideo_tpu.eval.suite.audio import mel_filterbank

    win, hop, n_fft = 400, 160, 1024
    x = np.asarray(waveform_seg, np.float32)
    # torchaudio center-pads by n_fft//2 (reflect)
    x = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (x.shape[0] - n_fft) // hop
    # torch.stft CENTERS the 400-tap window inside each 1024-sample FFT
    # frame; taking the first 400 samples shifted every frame ~19.5 ms
    # early — fatal for a synchronization metric
    off = (n_fft - win) // 2
    idx = off + np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(win)[None, :]
    frames = np.pad(frames, ((0, 0), (off, n_fft - win - off)))
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    fb = mel_filterbank(AUDIO_SR, n_fft, 128)
    return (power @ fb.T).T.astype(np.float32)  # [128, T]


@register("audio.desync")
class DeSyncMetric(BaseMetric):
    """Synchformer desynchronization in seconds (lower is better)."""

    requires_reference = False
    higher_is_better = False
    weights_env = "FASTVIDEO_SYNCHFORMER_WEIGHTS"

    def __init__(self, src_fps: float | None = None, backend: Any = None):
        self._src_fps = src_fps
        self._backend = backend
        if backend is not None:
            self.weights_env = None

    def setup(self) -> None:
        if self._backend is None:
            path = os.getenv("FASTVIDEO_SYNCHFORMER_WEIGHTS", "")
            raise FileNotFoundError(
                "audio.desync needs a local Synchformer export (an object "
                "with extract_vfeats/extract_afeats/compare_v_a, e.g. a "
                "torch.package of MMAudio's synchformer_state_dict); "
                f"FASTVIDEO_SYNCHFORMER_WEIGHTS={path!r} — or inject a "
                "backend.")

    def _mel(self, waveform_seg: np.ndarray) -> np.ndarray:
        return synchformer_mel(waveform_seg)

    def compute(self, sample: dict) -> MetricResult:
        from fastvideo_tpu.eval.suite.audio import _sample_audio

        video = sample.get("video")
        # standard worker convention first (video_audio/_sr via
        # _sample_audio); legacy explicit key as fallback
        audio, _sr = _sample_audio(sample, "video")
        if audio is None:
            audio = sample.get("audio_waveform")
        if video is None or audio is None:
            missing = [k for k, v in (("video", video), ("audio", audio))
                       if v is None]
            return self._skip(f"missing {', '.join(missing)}")
        fps = sample.get("fps") or self._src_fps
        if fps is None:
            return self._skip("missing 'fps' (or pass src_fps=)")
        self.setup()
        frames = resample_video(np.asarray(video, np.float32), SYNC_FPS,
                                float(fps))
        frames = video_transform(frames)
        try:
            vsegs = segment_video(frames)
            asegs = segment_audio(np.asarray(audio, np.float32))
        except ValueError as exc:
            return self._skip(str(exc))
        mels = np.stack([mel_normalize(self._mel(seg)) for seg in asegs])
        vfeats = self._backend.extract_vfeats(vsegs)
        afeats = self._backend.extract_afeats(mels)
        s_used = min(len(vfeats), len(afeats))
        if s_used < NUM_SEG_PER_DIRECTION:
            return self._skip(
                f"too few segments for Synchformer pos_emb (need "
                f"{NUM_SEG_PER_DIRECTION}, got v={len(vfeats)} "
                f"a={len(afeats)}); use clips of at least ~5 s")
        s = NUM_SEG_PER_DIRECTION
        front = self._backend.compare_v_a(vfeats[:s], afeats[:s])
        back = self._backend.compare_v_a(vfeats[-s:], afeats[-s:])
        score, fd, bd = desync_from_logits(np.asarray(front),
                                           np.asarray(back))
        return MetricResult(name=self.name, score=score, details={
            "front_desync_s": fd, "back_desync_s": bd,
            "num_segments_used": s})


@register("audio.imagebind_score")
class ImageBindScoreMetric(BaseMetric):
    """cos(ImageBind vision embed, audio embed)
    (reference imagebind_score/metric.py:40-103)."""

    requires_reference = False
    dependencies = ["imagebind"]

    def __init__(self):
        self._model = None

    def setup(self) -> None:
        if self._model is not None:
            return
        import torch
        from imagebind.models import imagebind_model

        self._model = imagebind_model.imagebind_huge(
            pretrained=True).eval()
        self._torch = torch

    def compute(self, sample: dict) -> MetricResult:
        video_path = sample.get("video_path")
        audio_path = sample.get("audio")
        if not video_path or not audio_path:
            return self._skip("needs video_path and audio file paths")
        self.setup()
        from imagebind import data as ib_data
        from imagebind.models.imagebind_model import ModalityType

        inputs = {
            ModalityType.VISION: ib_data.load_and_transform_video_data(
                [video_path], "cpu"),
            ModalityType.AUDIO: ib_data.load_and_transform_audio_data(
                [audio_path], "cpu"),
        }
        with self._torch.no_grad():
            embeds = self._model(inputs)
        v = embeds[ModalityType.VISION][0]
        a = embeds[ModalityType.AUDIO][0]
        score = self._torch.nn.functional.cosine_similarity(
            v, a, dim=-1).item()
        return MetricResult(name=self.name, score=float(score))


@register("audio.audiobox_aesthetics")
class AudioBoxAestheticsMetric(BaseMetric):
    """AudioBox Aesthetics PQ with CE/CU/PC/PQ details
    (reference audiobox_aesthetics/metric.py:25-80)."""

    requires_reference = False
    dependencies = ["audiobox_aesthetics"]

    def __init__(self):
        self._predictor = None

    def setup(self) -> None:
        if self._predictor is not None:
            return
        from audiobox_aesthetics.infer import initialize_predictor

        self._predictor = initialize_predictor()

    def compute(self, sample: dict) -> MetricResult:
        audio_path = sample.get("audio")
        if not audio_path:
            return self._skip("missing sample['audio'] path")
        self.setup()
        scores = self._predictor.forward([{"path": audio_path}])[0]
        return MetricResult(name=self.name, score=float(scores["PQ"]),
                            details={k: float(v)
                                     for k, v in scores.items()})
