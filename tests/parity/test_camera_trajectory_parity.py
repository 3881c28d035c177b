"""Camera trajectory (Plücker embeddings) parity vs reference numpy math."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402


@pytest.fixture(scope="module")
def ref_mod():
    try:
        return ref_loader.import_ref("fastvideo.models.camera.trajectory")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")


@pytest.mark.parametrize("action", ["w", "s", "a", "d", "left_rot",
                                    "up_rot"])
def test_trajectory_parity(ref_mod, action):
    from fastvideo_tpu.models.camera.trajectory import (
        create_camera_trajectory)

    H, W, T = 12, 16, 9
    import torch
    ref_out = ref_mod.create_camera_trajectory(
        action, height=H, width=W, num_frames=T, action_speed=0.3,
        dtype=torch.float32)
    if hasattr(ref_out, "numpy"):
        ref_out = ref_out.float().numpy()
    got = np.asarray(
        create_camera_trajectory(action, height=H, width=W, num_frames=T,
                                 action_speed=0.3, dtype=np.float32))
    assert got.shape == tuple(ref_out.shape)
    np.testing.assert_allclose(got, ref_out, atol=1e-5, rtol=1e-4)
