"""Workflow layer: validator filtering + frame sampling + orchestration."""

import numpy as np


def test_validator_filters_and_counts():
    from fastvideo_tpu.workflow.preprocess_workflow import (
        PreprocessingDataValidator)

    v = PreprocessingDataValidator(max_height=64, max_width=64,
                                   num_frames=8, train_fps=16)
    good = dict(caption="a cat", fps=16, num_frames=8, height=32, width=32)
    assert v(good)
    assert not v(dict(good, caption=""))            # data type
    assert not v(dict(good, height=128))            # resolution
    assert not v(dict(good, num_frames=16000))      # too long
    assert v.num_items_before_filtering == 4
    assert v.num_items_after_filtering == 1
    assert v.filter_counts["data_type_validator"] == 1
    v.log_validation_stats()


def test_sample_frame_indices():
    from fastvideo_tpu.workflow.preprocess_workflow import (
        sample_frame_indices)

    # 32fps source, 16fps training -> every other frame
    idx = sample_frame_indices(num_frames=20, fps=32, train_fps=16,
                               target_frames=5)
    np.testing.assert_array_equal(idx, [0, 2, 4, 6, 8])
    # slower source than training fps -> consecutive frames
    idx = sample_frame_indices(num_frames=10, fps=16, train_fps=16,
                               target_frames=4)
    np.testing.assert_array_equal(idx, [0, 1, 2, 3])


def test_preprocess_workflow_run(tmp_path):
    from types import SimpleNamespace

    from fastvideo_tpu.workflow.preprocess_workflow import PreprocessWorkflow

    class FakePipeline:
        def __init__(self):
            self.seen = []

        def run(self, samples, output_dir, fps=16.0):
            self.seen = list(samples)
            return len(self.seen)

    args = SimpleNamespace(num_frames=8, train_fps=16,
                           output_dir=str(tmp_path))
    wf = PreprocessWorkflow.__new__(PreprocessWorkflow)
    wf._init_modules = (None, None, None)
    wf.fastvideo_args = args
    wf._components = {}
    wf.register_components()
    fake = FakePipeline()
    wf.add_component("preprocess_pipeline", fake)

    frames = np.zeros((8, 32, 32, 3), np.uint8)
    samples = [
        {"id": "ok", "frames": frames, "caption": "good"},
        {"id": "bad", "frames": frames, "caption": ""},  # filtered
    ]
    n = wf.run(samples, str(tmp_path))
    assert n == 1
    assert fake.seen[0]["id"] == "ok"
