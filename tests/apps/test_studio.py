"""FastVideo Studio: database, training-config mapping, job runner,
server routes (reference apps/fastvideo_studio/)."""

import os
import time

import pytest


def test_database_jobs_datasets_settings(tmp_path):
    from fastvideo_tpu.apps.studio import Database

    db = Database(tmp_path / "studio.db")
    db.insert_job({"id": "j1", "name": "run1", "job_type": "training",
                   "workload_type": "full_t2v", "status": "pending",
                   "config": {"lr": 1e-5}})
    db.update_job("j1", {"status": "running", "progress": 0.5})
    job = db.get_job("j1")
    assert job["status"] == "running"
    assert job["progress"] == 0.5
    assert job["config"] == {"lr": 1e-5}
    assert len(db.get_all_jobs("training")) == 1
    assert db.get_all_jobs("inference") == []
    with pytest.raises(ValueError):
        db.update_job("j1", {"bogus": 1})

    db.insert_dataset({"id": "d1", "name": "clips", "path": "/tmp/x",
                       "kind": "raw"})
    db.upsert_dataset_caption("d1", "a.mp4", "a cat")
    db.upsert_dataset_caption("d1", "a.mp4", "a dog")
    assert db.get_dataset_captions("d1") == {"a.mp4": "a dog"}
    assert db.delete_dataset("d1")
    assert db.get_dataset("d1") is None

    settings = db.get_settings()
    assert "models_dir" in settings
    db.save_settings({"models_dir": "/models", "default_num_gpus": 4})
    s2 = db.get_settings()
    assert s2["models_dir"] == "/models" and s2["default_num_gpus"] == 4

    assert db.delete_job("j1") and not db.delete_job("j1")
    db.close()


def test_training_config_workloads(tmp_path):
    from fastvideo_tpu.apps.studio import build_training_config
    from fastvideo_tpu.training.run_config import TrainRunConfig

    base_job = {"model_id": "/models/wan", "data_path": "/data/p",
                "learning_rate": 1e-4, "max_train_steps": 10}

    sft = build_training_config(dict(base_job, workload_type="full_t2v"),
                                str(tmp_path))
    assert sft["method"] == "sft"
    assert sft["training"]["learning_rate"] == 1e-4
    assert sft["data"]["text_drop_rate"] == 0.1

    vsa = build_training_config(dict(base_job, workload_type="vsa_t2v"),
                                str(tmp_path))
    assert vsa["training"]["attention_backend"] == "VIDEO_SPARSE_ATTN"

    dmd = build_training_config(
        dict(base_job, workload_type="dmd_t2v",
             dmd_denoising_steps="1000,500"), str(tmp_path))
    assert dmd["method"] == "dmd2"
    assert dmd["dmd"]["dmd_denoising_steps"] == [1000, 500]
    assert dmd["training"]["betas"] == [0.0, 0.999]
    assert "ema" in dmd["callbacks"]

    sf = build_training_config(
        dict(base_job, workload_type="self_forcing_t2v"), str(tmp_path))
    assert sf["method"] == "self_forcing"
    assert sf["model"]["flow_shift"] == 5.0

    kd = build_training_config(dict(base_job, workload_type="ode_init"),
                               str(tmp_path))
    assert kd["method"] == "kd" and "t_list" in kd["method_config"]

    with pytest.raises(ValueError):
        build_training_config({"workload_type": "nope"}, str(tmp_path))
    with pytest.raises(ValueError):
        build_training_config({"workload_type": "full_t2v",
                               "model_id": "/models/ltx2"}, str(tmp_path))

    # every emitted training key must be a real TrainingArgs field
    from fastvideo_tpu.api.parser import parse_dataclass

    cfg = parse_dataclass(TrainRunConfig, sft)
    from fastvideo_tpu.training.run_config import build_training_args

    args = build_training_args(cfg)
    assert args.learning_rate == 1e-4


def test_job_runner_lifecycle(tmp_path):
    from fastvideo_tpu.apps.studio import Database, JobRunner, JobStatus

    db = Database(tmp_path / "studio.db")

    def fake_training(job, buf):
        for i in range(1, 4):
            buf.write(f"step {i}/3 loss=0.5\n")
            time.sleep(0.01)
        return 0

    def fake_fail(job, buf):
        buf.write("boom\n")
        return 3

    runner = JobRunner(db, outputs_dir=str(tmp_path / "out"),
                       run_training=fake_training)
    job = runner.create_job("run1", "training",
                            {"workload_type": "full_t2v"})
    assert job.status == JobStatus.PENDING
    runner.start_job(job.id)
    runner.wait(job.id, timeout=10)
    done = runner.get_job(job.id)
    assert done.status == JobStatus.COMPLETED
    assert done.progress == 1.0
    logs = runner.get_job_logs(job.id)
    assert any("step 3/3" in ln for ln in logs["lines"])
    # persisted
    assert db.get_job(job.id)["status"] == "completed"

    runner2 = JobRunner(db, outputs_dir=str(tmp_path / "out"),
                        run_training=fake_fail)
    j2 = runner2.create_job("run2", "training",
                            {"workload_type": "full_t2v"})
    runner2.start_job(j2.id)
    runner2.wait(j2.id, timeout=10)
    assert runner2.get_job(j2.id).status == JobStatus.FAILED
    assert "exit code 3" in runner2.get_job(j2.id).error

    with pytest.raises(ValueError):
        runner.create_job("bad", "training", {"workload_type": "nope"})

    # crash-safe reload: running job marked failed at boot
    db.update_job(job.id, {"status": "running"})
    runner3 = JobRunner(db, outputs_dir=str(tmp_path / "out"))
    assert runner3.get_job(job.id).status == JobStatus.FAILED


def test_log_buffer_ring_and_progress():
    from fastvideo_tpu.apps.studio import JobLogBuffer

    buf = JobLogBuffer(maxlen=5)
    for i in range(10):
        buf.write(f"line {i}: step {i}/9\n")
    lines, last = buf.get_lines(0)
    assert len(lines) == 5 and last == 10
    assert lines[-1].startswith("line 9")
    assert buf.progress == 1.0
    more, last2 = buf.get_lines(last)
    assert more == [] and last2 == 10


def test_server_handle_routes(tmp_path):
    from fastvideo_tpu.apps.studio import Database, JobRunner
    from fastvideo_tpu.apps.studio.server import StudioServer

    db = Database(tmp_path / "studio.db")
    runner = JobRunner(db, outputs_dir=str(tmp_path / "out"),
                       run_training=lambda job, buf: 0)
    srv = StudioServer(str(tmp_path), db=db, runner=runner)

    def call(method, path, body=None, query=None):
        return srv.handle(method, path, query or {}, body)

    assert call("GET", "/health")[1]["status"] == "ok"
    assert call("GET", "/api/workloads")[1]["workloads"]

    code, out = call("PUT", "/api/settings",
                     {"models_dir": str(tmp_path)})
    assert code == 200 and out["models_dir"] == str(tmp_path)
    assert call("PUT", "/api/settings", {"bogus": 1})[0] == 400

    # dataset CRUD
    ds_dir = tmp_path / "clips"
    ds_dir.mkdir()
    (ds_dir / "a.mp4").write_bytes(b"xx")
    code, ds = call("POST", "/api/datasets", {"name": "clips",
                                              "path": str(ds_dir)})
    assert code == 201 and ds["num_files"] == 1
    ds_id = ds["id"]
    assert call("PUT", f"/api/datasets/{ds_id}/captions",
                {"file_name": "a.mp4", "caption": "a cat"})[0] == 200
    assert call("GET", f"/api/datasets/{ds_id}"
                )[1]["captions"]["a.mp4"] == "a cat"
    code, media = call("GET", f"/api/datasets/{ds_id}/media/a.mp4")
    assert code == 200 and media["_file"].endswith("a.mp4")
    assert call("GET",
                f"/api/datasets/{ds_id}/media/../outside")[0] == 400
    assert call("GET", f"/api/datasets/{ds_id}/files")[1]["files"] == \
        ["a.mp4"]

    # job CRUD (dataset_id resolves to data_path)
    code, job = call("POST", "/api/jobs", {
        "name": "run1", "job_type": "training",
        "config": {"workload_type": "full_t2v", "dataset_id": ds_id}})
    assert code == 201
    assert job["config"]["data_path"] == str(ds_dir)
    job_id = job["id"]
    assert call("POST", f"/api/jobs/{job_id}/start")[0] == 200
    runner.wait(job_id, timeout=10)
    assert call("GET", f"/api/jobs/{job_id}")[1]["status"] == "completed"
    assert call("GET", f"/api/jobs/{job_id}/logs")[1]["status"] == \
        "completed"
    assert call("DELETE", f"/api/jobs/{job_id}")[0] == 200
    assert call("GET", f"/api/jobs/{job_id}")[0] == 404
    assert call("POST", "/api/jobs", {
        "name": "bad", "job_type": "training",
        "config": {"workload_type": "nope"}})[0] == 400

    # base64 upload staging
    import base64

    code, up = call("POST", "/api/upload-raw-dataset", {"files": [
        {"name": "b.mp4", "content_b64":
         base64.b64encode(b"vid").decode()}]})
    assert code == 200 and up["num_files"] == 1
    staged = os.path.join(up["staging_path"], "b.mp4")
    assert open(staged, "rb").read() == b"vid"


def test_server_http_transport(tmp_path):
    import json
    import urllib.request

    from fastvideo_tpu.apps.studio import Database, JobRunner
    from fastvideo_tpu.apps.studio.server import StudioServer

    db = Database(tmp_path / "studio.db")
    runner = JobRunner(db, outputs_dir=str(tmp_path / "out"),
                       run_training=lambda job, buf: 0)
    srv = StudioServer(str(tmp_path), db=db, runner=runner, port=0)
    srv.serve_background()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(f"{base}/health", timeout=5) as r:
            assert json.loads(r.read())["status"] == "ok"
        req = urllib.request.Request(
            f"{base}/api/jobs",
            data=json.dumps({"name": "j", "job_type": "training",
                             "config": {"workload_type":
                                        "full_t2v"}}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.status == 201
        with urllib.request.urlopen(f"{base}/api/jobs", timeout=5) as r:
            assert len(json.loads(r.read())["jobs"]) == 1
    finally:
        srv.shutdown()


def test_server_serves_web_ui(tmp_path):
    """GET / returns the single-file Studio web UI (reference analog:
    apps/fastvideo_studio Next.js frontend)."""
    import urllib.request

    from fastvideo_tpu.apps.studio import Database, JobRunner
    from fastvideo_tpu.apps.studio.server import StudioServer

    db = Database(tmp_path / "studio.db")
    runner = JobRunner(db, outputs_dir=str(tmp_path / "out"),
                       run_training=lambda job, buf: 0)
    srv = StudioServer(str(tmp_path), db=db, runner=runner, port=0)
    srv.serve_background()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(f"{base}/", timeout=5) as r:
            assert r.headers["Content-Type"].startswith("text/html")
            page = r.read().decode()
        assert "FastVideo Studio" in page
        assert "/api/jobs" in page  # the UI drives the real API
        # the page consumes the wrapped response shapes + job field names
        for token in ("jobsR.jobs", "dsR.datasets", "modelsR.models",
                      "workloadsR.workloads", "j.workload_type",
                      "j.model_id"):
            assert token in page, token
        # and posts the server's exact job-create contract
        import json as _json

        body = {"name": "ui-job", "job_type": "training",
                "config": {"workload_type": "lora_t2v",
                           "model_id": "/models/x", "max_steps": 10}}
        req = urllib.request.Request(
            f"{base}/api/jobs", data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=5) as r:
            created = _json.loads(r.read())
        assert created["workload_type"] == "lora_t2v"
        assert created["model_id"] == "/models/x"
    finally:
        srv.shutdown()
