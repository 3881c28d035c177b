"""Tracker subsystem: JSONL backend, sequential fan-out, degradation."""

import json
import os


def test_jsonl_tracker(tmp_path):
    from fastvideo_tpu.training.trackers import initialize_trackers

    tr = initialize_trackers(["jsonl"], "proj", config={"lr": 1e-5},
                             log_dir=str(tmp_path), run_name="r1")
    tr.log({"loss": 0.5, "grad_norm": 1.2}, step=1)
    with tr.timed("timing/step", step=2):
        pass
    tr.finish()
    run_dir = tmp_path / "proj" / "r1"
    rows = [json.loads(line)
            for line in open(run_dir / "metrics.jsonl")]
    assert rows[0]["loss"] == 0.5 and rows[0]["step"] == 1
    assert any("timing/step" in r for r in rows)
    cfg = json.load(open(run_dir / "config.json"))
    assert cfg["lr"] == 1e-5


def test_unknown_and_unavailable_backends_degrade(tmp_path, monkeypatch):
    import builtins
    import sys

    from fastvideo_tpu.training.trackers import (DummyTracker,
                                                 initialize_trackers)

    # force wandb to be unimportable (parity tests stub a fake module
    # into sys.modules for reference imports, so don't rely on absence)
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    real_import = builtins.__import__

    def blocked(name, *a, **k):
        if name == "wandb":
            raise ImportError("wandb blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", blocked)
    tr = initialize_trackers(["nope", "wandb"], "proj",
                             log_dir=str(tmp_path))
    assert isinstance(tr, DummyTracker)
    tr.log({"x": 1}, 0)
    tr.finish()


def test_sequential_tracker(tmp_path):
    from fastvideo_tpu.training.trackers import (JsonlTracker,
                                                 SequentialTracker)

    a = JsonlTracker("p", log_dir=str(tmp_path), run_name="a")
    b = JsonlTracker("p", log_dir=str(tmp_path), run_name="b")
    seq = SequentialTracker([a, b])
    seq.log({"m": 2.0}, 3)
    seq.finish()
    for run in ("a", "b"):
        rows = [json.loads(line)
                for line in open(os.path.join(tmp_path, "p", run,
                                              "metrics.jsonl"))]
        assert rows[0]["m"] == 2.0
