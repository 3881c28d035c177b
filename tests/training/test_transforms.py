"""Video transforms: crop geometry, resize, normalize, temporal crop."""

import numpy as np


def test_center_crop_aspect():
    from fastvideo_tpu.dataset.transform import center_crop_th_tw

    clip = np.zeros((2, 3, 100, 50), np.uint8)  # tall clip
    out = center_crop_th_tw(clip, 32, 32)       # square target
    assert out.shape == (2, 3, 50, 50)
    wide = np.zeros((2, 3, 50, 100), np.uint8)
    out = center_crop_th_tw(wide, 32, 32)
    assert out.shape == (2, 3, 50, 50)


def test_center_crop_resize_video():
    from fastvideo_tpu.dataset.transform import CenterCropResizeVideo

    tr = CenterCropResizeVideo((32, 48))
    clip = np.random.default_rng(0).integers(
        0, 255, (3, 3, 70, 90), dtype=np.uint8)
    out = tr(clip)
    assert out.shape == (3, 3, 32, 48)
    assert out.dtype == np.float32


def test_normalize_and_compose():
    from fastvideo_tpu.dataset.transform import (CenterCropResizeVideo,
                                                 Compose, Normalize255)

    clip = np.full((1, 3, 64, 64), 255, np.uint8)
    pipe = Compose([CenterCropResizeVideo((32, 32)), Normalize255()])
    out = pipe(clip)
    assert out.shape == (1, 3, 32, 32)
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_temporal_random_crop():
    import random

    from fastvideo_tpu.dataset.transform import TemporalRandomCrop

    random.seed(0)
    tr = TemporalRandomCrop(8)
    for total in (8, 9, 100):
        begin, end = tr(total)
        assert 0 <= begin <= end <= total
        assert end - begin <= 8
