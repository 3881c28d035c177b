"""ComfyUI nodes: mappings, config filtering, image loading, generation
(reference comfyui/video_generator/)."""

import sys

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _repo_on_path():
    root = "/root/repo"
    if root not in sys.path:
        sys.path.insert(0, root)


def test_node_mappings_complete():
    from comfyui import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS

    expected = {"VideoGenerator", "InferenceArgs", "VAEConfig",
                "TextEncoderConfig", "DITConfig", "LoadImagePath"}
    assert set(NODE_CLASS_MAPPINGS) == expected
    assert set(NODE_DISPLAY_NAME_MAPPINGS) == expected
    for cls in NODE_CLASS_MAPPINGS.values():
        assert hasattr(cls, "INPUT_TYPES")
        assert hasattr(cls, "RETURN_TYPES")
        assert hasattr(cls, "FUNCTION")
        assert cls.CATEGORY == "fastvideo"


def test_inference_args_filters_unset():
    from comfyui.video_generator import InferenceArgs

    (args,) = InferenceArgs().set_args(height=480, width=832,
                                       num_frames=-99999, seed=7,
                                       image_path="")
    assert args["height"] == 480 and args["seed"] == 7
    assert "num_frames" not in args  # sentinel dropped
    assert "image_path" not in args  # empty dropped


def test_config_nodes_filter():
    from comfyui.video_generator import (DITConfig, TextEncoderConfig,
                                         VAEConfig)

    (vae,) = VAEConfig().set_args(use_tiling=False,
                                  tile_sample_min_height=128)
    assert vae == {"use_tiling": False, "tile_sample_min_height": 128}
    (te,) = TextEncoderConfig().set_args(prefix="", quant_config="int8")
    assert te == {"quant_config": "int8"}
    (dit,) = DITConfig().set_args(prefix="transformer")
    assert dit == {"prefix": "transformer"}


def test_load_image_path(tmp_path):
    import PIL.Image

    from comfyui.video_generator import LoadImagePath

    img = PIL.Image.new("RGBA", (8, 6), (255, 0, 0, 128))
    p = tmp_path / "img.png"
    img.save(p)
    path, rgb, mask = LoadImagePath().load_image(str(p))
    assert path == str(p)
    assert rgb.shape == (1, 6, 8, 3)
    assert mask.shape == (1, 6, 8)
    np.testing.assert_allclose(rgb[0, 0, 0], [1.0, 0.0, 0.0], atol=1e-3)
    np.testing.assert_allclose(mask[0, 0, 0], 1.0 - 128 / 255, atol=1e-3)


def test_video_generator_node_runs(tmp_path, monkeypatch):
    from comfyui.video_generator import VideoGenerator as Node

    calls = {}

    class FakeArgs:
        class pipeline_config:
            use_tiling = True

        pipeline_config = pipeline_config()

    class FakeGen:
        fastvideo_args = FakeArgs()

        def generate_video(self, **kwargs):
            calls.update(kwargs)
            out = tmp_path / "video.mp4"
            out.write_bytes(b"vid")

    node = Node()
    monkeypatch.setattr(Node, "_get_generator",
                        lambda self, mp, n, ov: FakeGen())
    (path,) = node.launch_inference(
        prompt="a cat", output_path=str(tmp_path), model_path="/m",
        inference_args={"height": 128, "fps": 24},
        vae_config={"use_tiling": False})
    assert path.endswith("video.mp4")
    assert calls["height"] == 128
    assert "fps" not in calls  # consumed by the node, not the pipeline
    assert FakeGen.fastvideo_args.pipeline_config.use_tiling is False
