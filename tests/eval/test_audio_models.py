"""DeSync preprocessing + scoring harness with a fake Synchformer
backend (reference eval/metrics/audio/desync/)."""

import numpy as np
import pytest


def test_grid_and_logit_scoring():
    from fastvideo_tpu.eval.suite.audio_models import (desync_from_logits,
                                                       make_class_grid)

    grid = make_class_grid(-2.0, 2.0, 21)
    assert len(grid) == 21
    assert grid[10] == pytest.approx(0.0)
    assert grid[0] == -2.0 and grid[-1] == 2.0

    front = np.zeros(21)
    front[10] = 5.0   # perfectly synced
    back = np.zeros(21)
    back[15] = 5.0    # +1.0 s offset
    score, fd, bd = desync_from_logits(front, back)
    assert fd == 0.0 and bd == pytest.approx(1.0)
    assert score == pytest.approx(0.5)


def test_segmentation_windows():
    from fastvideo_tpu.eval.suite.audio_models import (segment_audio,
                                                       segment_video)

    frames = np.zeros((40, 4, 4, 3), np.float32)
    vsegs = segment_video(frames)
    assert vsegs.shape == (4, 16, 4, 4, 3)  # starts 0, 8, 16, 24
    with pytest.raises(ValueError):
        segment_video(np.zeros((8, 4, 4, 3), np.float32))

    wav = np.zeros(16000 * 2, np.float32)
    asegs = segment_audio(wav)
    # (32000 - 10240) // 5120 + 1 = 5 windows
    assert asegs.shape == (5, 10240)


def test_video_resample_and_transform():
    from fastvideo_tpu.eval.suite.audio_models import (resample_video,
                                                       video_transform)

    frames = np.random.default_rng(0).random((30, 64, 96, 3)).astype(
        np.float32)
    out = resample_video(frames, 25.0, 30.0)
    assert len(out) == 25  # 1 s clip -> 25 frames
    assert resample_video(frames, 25.0, 25.0) is frames

    tr = video_transform(frames[:2])
    assert tr.shape == (2, 224, 224, 3)


def test_desync_metric_with_fake_backend():
    from fastvideo_tpu.eval.registry import _REGISTRY, load_builtin_metrics

    load_builtin_metrics()
    cls = _REGISTRY["audio.desync"]

    class FakeSync:
        def extract_vfeats(self, vsegs):
            return np.zeros((len(vsegs), 8))

        def extract_afeats(self, mels):
            assert mels.shape[1:] == (128, 66)  # normalized mel windows
            return np.zeros((len(mels), 8))

        def compare_v_a(self, v, a):
            logits = np.zeros(21)
            logits[12] = 1.0  # +0.4 s
            return logits

    m = cls(backend=FakeSync())
    t = 150  # 6 s at 25 fps -> >=14 segments
    video = np.zeros((t, 32, 32, 3), np.float32)
    audio = np.zeros(16000 * 6, np.float32)
    res = m.compute({"video": video, "audio_waveform": audio, "fps": 25})
    assert res.score == pytest.approx(0.4, abs=1e-6)
    assert res.details["num_segments_used"] == 14

    # too-short clip skips with a clear reason
    short = m.compute({"video": video[:40],
                       "audio_waveform": audio[:30000], "fps": 25})
    assert short.score is None

    # gating visible without a backend
    from fastvideo_tpu.eval.registry import missing_dependencies

    missing = missing_dependencies("audio.desync")
    assert any("SYNCHFORMER" in m or "librosa" in m for m in missing) \
        or missing == []


def test_imagebind_and_audiobox_registered():
    from fastvideo_tpu.eval.registry import (list_metric_classes,
                                             missing_dependencies)

    names = list_metric_classes()
    assert "audio.imagebind_score" in names
    assert "audio.audiobox_aesthetics" in names
    # both gate on their pip packages in this environment
    assert "imagebind" in missing_dependencies("audio.imagebind_score")
    assert "audiobox_aesthetics" in \
        missing_dependencies("audio.audiobox_aesthetics")
