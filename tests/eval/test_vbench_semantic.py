"""Semantic VBench dims with an injected fake CLIP dual tower.

Reference protocols: fastvideo/eval/metrics/vbench/{object_class, color,
multiple_objects, scene, human_action, spatial_relationship,
overall_consistency, appearance_style}.
"""

import numpy as np
import pytest


class _FakeTower:
    """Deterministic dual tower: prompts and frames map to unit vectors
    set up by the test; unknown prompts get an orthogonal-ish hash."""

    def __init__(self, text_map, frame_vecs):
        self.text_map = text_map
        self.frame_vecs = np.asarray(frame_vecs, np.float32)

    def _vec(self, prompt):
        if prompt in self.text_map:
            v = np.asarray(self.text_map[prompt], np.float32)
        else:
            rng = np.random.default_rng(abs(hash(prompt)) % (2**31))
            v = rng.standard_normal(self.frame_vecs.shape[-1])
        return v / (np.linalg.norm(v) + 1e-9)

    def embed_text(self, prompts):
        return np.stack([self._vec(p) for p in prompts])

    def embed_frames_hwc(self, frames):
        n = len(frames)
        v = self.frame_vecs[:n]
        return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _metric(name, tower):
    from fastvideo_tpu.eval.registry import _REGISTRY, load_builtin_metrics

    load_builtin_metrics()
    cls = _REGISTRY[name]
    m = cls()
    type(m)._tower = tower
    return m


@pytest.fixture(autouse=True)
def _reset_towers():
    yield
    from fastvideo_tpu.eval.suite import vbench_semantic as vs

    for obj in vars(vs).values():
        if isinstance(obj, type) and hasattr(obj, "_tower"):
            obj._tower = None


def test_all_16_vbench_dims_registered():
    from fastvideo_tpu.eval.registry import list_metric_classes

    names = [n for n in list_metric_classes() if n.startswith("vbench.")]
    assert len(names) >= 16
    for dim in ("overall_consistency", "temporal_style", "appearance_style",
                "object_class", "multiple_objects", "color", "scene",
                "human_action", "spatial_relationship", "imaging_quality"):
        assert f"vbench.{dim}" in names, dim


def test_object_class_detection():
    e_cat = [1, 0, 0, 0]
    e_generic = [0, 0, 0, 1]
    # 3 frames look like cats, 1 like the generic photo
    tower = _FakeTower(
        {"a photo of a cat": e_cat, "a photo": e_generic},
        [e_cat, e_cat, e_cat, e_generic])
    m = _metric("vbench.object_class", tower)
    video = np.zeros((4, 8, 8, 3), np.float32)
    res = m.compute({"video": video, "auxiliary_info": {"object": "cat"}})
    assert res.score == pytest.approx(0.75)
    # multi-object rows are skipped by object_class
    res2 = m.compute({"video": video,
                      "auxiliary_info": {"object": "cat and dog"}})
    assert res2.score is None


def test_multiple_objects_requires_both():
    e_cat, e_dog, e_gen = [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1]
    both = np.array(e_cat) + np.array(e_dog)
    tower = _FakeTower(
        {"a photo of a cat": e_cat, "a photo of a dog": e_dog,
         "a photo": e_gen},
        [both, both, e_cat, e_gen])
    m = _metric("vbench.multiple_objects", tower)
    video = np.zeros((4, 8, 8, 3), np.float32)
    res = m.compute({"video": video,
                     "auxiliary_info": {"object": "cat and dog"}})
    assert res.score == pytest.approx(0.5)


def test_color_classification():
    e_obj, e_gen = [1, 0, 0, 0], [0, 0, 0, 1]
    e_red = [1, 1, 0, 0]
    e_blue = [1, 0, 1, 0]
    text = {"a photo of a car": e_obj, "a photo": e_gen,
            "a red car": e_red, "a blue car": e_blue}
    # frames: 2 red cars, 1 blue car, 1 generic (no car)
    tower = _FakeTower(text, [e_red, e_red, e_blue, e_gen])
    m = _metric("vbench.color", tower)
    video = np.zeros((4, 8, 8, 3), np.float32)
    res = m.compute({"video": video, "text_prompt": "a red car",
                     "auxiliary_info": {"color": "red"}})
    # 3 frames detect the car; 2 classify red
    assert res.score == pytest.approx(2 / 3)


def test_spatial_relationship_prompt_contrast():
    correct = [1, 0, 0, 0]
    wrong = [0, 1, 0, 0]
    text = {"a cat on the left of a dog": correct,
            "a cat on the right of a dog": wrong}
    tower = _FakeTower(text, [correct, correct, wrong])
    m = _metric("vbench.spatial_relationship", tower)
    video = np.zeros((3, 8, 8, 3), np.float32)
    res = m.compute({
        "video": video,
        "auxiliary_info": {"spatial_relationship": {
            "object_a": "cat", "object_b": "dog",
            "relationship": "on the left of"}},
    })
    assert res.score == pytest.approx(2 / 3)


def test_overall_consistency_and_styles():
    e_prompt = [1, 0, 0, 0]
    tower = _FakeTower({"a serene lake": e_prompt},
                       [e_prompt] * 8)
    m = _metric("vbench.overall_consistency", tower)
    video = np.zeros((8, 8, 8, 3), np.float32)
    res = m.compute({"video": video, "text_prompt": "a serene lake"})
    assert res.score == pytest.approx(1.0, abs=1e-5)

    m2 = _metric("vbench.appearance_style", tower)
    res2 = m2.compute({"video": video,
                       "auxiliary_info": {
                           "appearance_style": "a serene lake"}})
    assert res2.score == pytest.approx(1.0, abs=1e-5)

    m3 = _metric("vbench.human_action", tower)
    act = _FakeTower({"a person dancing": [1, 0, 0, 0],
                      "a person": [0, 0, 0, 1]},
                     [[1, 0, 0, 0]] * 4)
    type(m3)._tower = act
    res3 = m3.compute({"video": video[:4],
                       "auxiliary_info": {"human_action": "dancing"}})
    assert res3.score == pytest.approx(1.0)


def test_gating_reported_without_weights(monkeypatch):
    from fastvideo_tpu.eval.registry import missing_dependencies

    monkeypatch.delenv("FASTVIDEO_CLIPSCORE_WEIGHTS", raising=False)
    missing = missing_dependencies("vbench.object_class")
    assert any("FASTVIDEO_CLIPSCORE_WEIGHTS" in m for m in missing)
    # imaging_quality gates on the optional pyiqa package instead
    assert missing_dependencies("vbench.imaging_quality") in ([], ["pyiqa"])
