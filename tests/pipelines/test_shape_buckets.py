"""Shape bucketing in the input-validation stage (TPU compile control)."""

import pytest


def test_snap_shape_to_bucket():
    from fastvideo_tpu.pipelines.stages.input_validation import (
        snap_shape_to_bucket)

    assert snap_shape_to_bucket(480, 832, 81) == (512, 832, 81)
    assert snap_shape_to_bucket(100, 100, 20) == (128, 128, 21)
    assert snap_shape_to_bucket(30, 30, 1) == (64, 64, 1)
    assert snap_shape_to_bucket(512, 512, None) == (512, 512, None)


def test_stage_snaps_when_enabled(monkeypatch):
    from fastvideo_tpu.fastvideo_args import FastVideoArgs
    from fastvideo_tpu.pipelines.batch import ForwardBatch
    from fastvideo_tpu.pipelines.stages.input_validation import (
        InputValidationStage)

    from fastvideo_tpu.pipelines.stages.base import StageVerificationError

    stage = InputValidationStage()
    args = FastVideoArgs(model_path="x")
    # default: no snapping -> 100 % 8 != 0 raises
    with pytest.raises(StageVerificationError):
        stage.forward(ForwardBatch(prompt="p", height=100, width=100,
                                   num_frames=20), args)
    monkeypatch.setenv("FASTVIDEO_SHAPE_BUCKETS", "1")
    batch2 = ForwardBatch(prompt="p", height=100, width=100,
                          num_frames=20)
    out2 = stage.forward(batch2, args)
    assert (out2.height, out2.width, out2.num_frames) == (128, 128, 21)

    args3 = FastVideoArgs(model_path="x", shape_bucketing=True)
    monkeypatch.delenv("FASTVIDEO_SHAPE_BUCKETS")
    batch3 = ForwardBatch(prompt="p", height=481, width=833,
                          num_frames=81)
    out3 = stage.forward(batch3, args3)
    assert (out3.height, out3.width) == (512, 832)
