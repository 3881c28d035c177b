"""MiniMax H3 packing + scheduler parity vs the reference (pure math)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402


@pytest.fixture(scope="module")
def ref_packing():
    """Load the reference packing module by file path — the package
    route drags in fastvideo.pipelines.__init__ (circular imports)."""
    import importlib.util

    try:
        ref_loader.install()
        spec = importlib.util.spec_from_file_location(
            "_ref_minimax_packing",
            "/root/reference/fastvideo/pipelines/basic/minimax_h3/"
            "packing.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod  # dataclass machinery needs this
        spec.loader.exec_module(mod)
        return mod
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")


def test_geometry_helpers(ref_packing):
    from fastvideo_tpu.pipelines.basic.minimax_h3 import packing as ours

    assert ours.resolve_canvas_size(16, 9) == \
        ref_packing.resolve_canvas_size(16, 9)
    assert ours.resolve_canvas_size(1, 2) == \
        ref_packing.resolve_canvas_size(1, 2)
    for f in (1, 22, 90):
        assert ours.align_num_frames(f) == ref_packing.align_num_frames(f)
    f = ours.align_num_frames(90)
    assert ours.video_latent_num_frames(f) == \
        ref_packing.video_latent_num_frames(f)
    assert ours.audio_latent_num_frames(f) == \
        ref_packing.audio_latent_num_frames(f)


@pytest.mark.parametrize("anchors", [(), ("first",), ("first", "last")])
def test_packed_layout_parity(ref_packing, anchors):
    import torch

    from fastvideo_tpu.pipelines.basic.minimax_h3 import packing as ours

    tags = np.array([1, 1, 0, 0, 1], np.int64)
    kw = dict(num_latent_frames=7, latent_height=8, latent_width=12,
              num_audio_latents=6, patch_size=(1, 2, 2),
              keyframe_anchors=anchors)
    ref = ref_packing.build_packed_sequence(torch.from_numpy(tags), **kw)
    got = ours.build_packed_sequence(tags, **kw)
    assert got.sequence_length == ref.sequence_length
    np.testing.assert_allclose(got.position_ids,
                               ref.position_ids.numpy(), rtol=1e-12)
    np.testing.assert_array_equal(got.token_tags, ref.token_tags.numpy())
    np.testing.assert_array_equal(got.video_indices,
                                  ref.video_indices.numpy())
    np.testing.assert_array_equal(got.audio_indices,
                                  ref.audio_indices.numpy())


def test_patchify_roundtrip(ref_packing):
    import torch

    from fastvideo_tpu.pipelines.basic.minimax_h3 import packing as ours

    rng = np.random.default_rng(0)
    lat = rng.standard_normal((1, 4, 6, 8, 12)).astype(np.float32)
    got = ours.patchify_video_latents(lat, (1, 2, 2))
    ref = ref_packing.patchify_video_latents(torch.from_numpy(lat),
                                             (1, 2, 2)).numpy()
    np.testing.assert_array_equal(got, ref)
    back = ours.unpatchify_video_tokens(got, 6, 8, 12, 4, (1, 2, 2))
    np.testing.assert_array_equal(back, lat)


def test_minimax_scheduler_parity():
    try:
        import importlib

        ref_sched_mod = ref_loader.import_ref(
            "fastvideo.models.schedulers.scheduling_minimax_h3")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import jax.numpy as jnp
    import torch

    from fastvideo_tpu.models.schedulers.minimax_h3 import MiniMaxH3Scheduler

    ref = ref_sched_mod.MiniMaxH3Scheduler(shift=12.0)
    ref.set_timesteps(8)
    ours = MiniMaxH3Scheduler(shift=12.0)
    ours.set_timesteps(8)
    np.testing.assert_allclose(ours.sigmas, ref.sigmas.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours.timesteps, ref.timesteps.numpy(),
                               atol=1e-6)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    v = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    for t_ref, t_ours in zip(ref.timesteps, ours.timesteps):
        r = ref.step(torch.from_numpy(v), t_ref, torch.from_numpy(x),
                     return_dict=False)[0].numpy()
        o = np.asarray(
            ours.step(jnp.asarray(v), float(t_ours),
                      jnp.asarray(x)).prev_sample)
        np.testing.assert_allclose(o, r, atol=1e-5, rtol=1e-5)
        x = r
