"""Studio job runner: threaded lifecycle over training/inference jobs.

Behavior analog of /root/reference/apps/fastvideo_studio/job_runner.py
(:45-940): Job/JobStatus state machine, ring-buffer log capture with
progress parsing, sqlite persistence, crash-safe reload. TPU deviations:
training jobs launch ``python -m fastvideo_tpu.entrypoints.cli.train``
as a single-controller subprocess (no torchrun elastic launch); the
``lora_t2v`` workload runs a full finetune then extracts the LoRA by
SVD against the base (scripts/lora_extraction) instead of in-graph
adapter training.
"""

from __future__ import annotations

import enum
import json
import os
import re
import subprocess
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable

from fastvideo_tpu.apps.studio.database import Database
from fastvideo_tpu.apps.studio.training_config import (SUPPORTED_WORKLOADS,
                                                       build_training_config)
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

_MAX_LOG_LINES = 4000
# "step 37/1000" or "37/1000 [" (tqdm) -> progress fraction
_PROGRESS_RE = re.compile(r"(?:step\s+)?(\d+)\s*/\s*(\d+)")


class JobStatus(str, enum.Enum):
    PENDING = "pending"
    RUNNING = "running"
    COMPLETED = "completed"
    FAILED = "failed"
    STOPPED = "stopped"


class JobLogBuffer:
    """Ring buffer of log lines + parsed progress
    (reference job_runner.py:53-104)."""

    def __init__(self, maxlen: int = _MAX_LOG_LINES):
        self.maxlen = maxlen
        self._lines: list[str] = []
        self._offset = 0  # count of lines dropped from the front
        self._lock = threading.Lock()
        self.progress: float | None = None

    def write(self, text: str) -> None:
        with self._lock:
            for line in text.splitlines():
                if not line.strip():
                    continue
                self._lines.append(line)
                self._parse_progress(line)
            drop = len(self._lines) - self.maxlen
            if drop > 0:
                self._lines = self._lines[drop:]
                self._offset += drop

    def _parse_progress(self, line: str) -> None:
        m = _PROGRESS_RE.search(line)
        if m:
            cur, total = int(m.group(1)), int(m.group(2))
            if total > 0 and cur <= total:
                self.progress = cur / total

    def get_lines(self, after: int = 0) -> tuple[list[str], int]:
        """Lines with absolute index > ``after``; returns (lines, last)."""
        with self._lock:
            start = max(0, after - self._offset)
            lines = self._lines[start:]
            return lines, self._offset + len(self._lines)


@dataclass
class Job:
    id: str
    name: str
    job_type: str            # training | inference
    workload_type: str = "full_t2v"
    status: JobStatus = JobStatus.PENDING
    model_id: str = ""
    config: dict[str, Any] = field(default_factory=dict)
    output_dir: str = ""
    error: str = ""
    progress: float = 0.0
    created_at: float = field(default_factory=time.time)
    started_at: float | None = None
    finished_at: float | None = None

    def to_dict(self) -> dict[str, Any]:
        d = dict(self.__dict__)
        d["status"] = self.status.value
        return d


class JobRunner:
    """Owns job threads/subprocesses; persists every transition."""

    def __init__(self, db: Database, outputs_dir: str = "outputs",
                 run_training: Callable[["Job", JobLogBuffer], int] | None
                 = None,
                 run_inference: Callable[["Job", JobLogBuffer], int] | None
                 = None):
        self.db = db
        self.outputs_dir = outputs_dir
        self._jobs: dict[str, Job] = {}
        self._logs: dict[str, JobLogBuffer] = {}
        self._procs: dict[str, subprocess.Popen] = {}
        self._threads: dict[str, threading.Thread] = {}
        self._stop_requested: set[str] = set()
        self._lock = threading.Lock()
        self._run_training = run_training or self._run_training_subprocess
        self._run_inference = run_inference or self._run_inference_inline
        self._load_jobs()

    # -- persistence ---------------------------------------------------------

    def _load_jobs(self) -> None:
        """Reload persisted jobs; anything RUNNING at boot crashed
        (reference :298-368)."""
        for row in self.db.get_all_jobs():
            status = JobStatus(row.get("status") or "pending")
            if status == JobStatus.RUNNING:
                status = JobStatus.FAILED
                self.db.update_job(row["id"], {
                    "status": status.value,
                    "error": "server restarted while job was running"})
                row["error"] = "server restarted while job was running"
            job = Job(id=row["id"], name=row.get("name") or "",
                      job_type=row.get("job_type") or "training",
                      workload_type=row.get("workload_type") or "full_t2v",
                      status=status, model_id=row.get("model_id") or "",
                      config=row.get("config") or {},
                      output_dir=row.get("output_dir") or "",
                      error=row.get("error") or "",
                      progress=row.get("progress") or 0.0,
                      created_at=row.get("created_at") or time.time(),
                      started_at=row.get("started_at"),
                      finished_at=row.get("finished_at"))
            self._jobs[job.id] = job
            self._logs[job.id] = JobLogBuffer()

    def _save(self, job: Job) -> None:
        self.db.update_job(job.id, {
            "status": job.status.value, "error": job.error,
            "progress": job.progress, "started_at": job.started_at,
            "finished_at": job.finished_at, "output_dir": job.output_dir})

    # -- lifecycle -----------------------------------------------------------

    def create_job(self, name: str, job_type: str,
                   config: dict[str, Any]) -> Job:
        workload = config.get("workload_type", "full_t2v")
        if job_type == "training" and workload not in SUPPORTED_WORKLOADS:
            raise ValueError(f"Unknown workload type: {workload}")
        job_id = uuid.uuid4().hex[:12]
        output_dir = os.path.join(self.outputs_dir, job_id)
        job = Job(id=job_id, name=name, job_type=job_type,
                  workload_type=workload,
                  model_id=config.get("model_id", ""), config=config,
                  output_dir=output_dir)
        with self._lock:
            self._jobs[job_id] = job
            self._logs[job_id] = JobLogBuffer()
        self.db.insert_job(job.to_dict())
        return job

    def get_job(self, job_id: str) -> Job | None:
        return self._jobs.get(job_id)

    def list_jobs(self, job_type: str | None = None) -> list[Job]:
        jobs = [j for j in self._jobs.values()
                if job_type is None or j.job_type == job_type]
        return sorted(jobs, key=lambda j: j.created_at, reverse=True)

    def start_job(self, job_id: str) -> Job:
        job = self._require(job_id)
        if job.status == JobStatus.RUNNING:
            raise ValueError(f"Job {job_id} is already running")
        job.status = JobStatus.RUNNING
        job.error = ""
        job.started_at = time.time()
        job.finished_at = None
        self._stop_requested.discard(job_id)
        self._save(job)

        def safe_run(job: Job) -> None:
            buf = self._logs[job.id]
            try:
                runner = (self._run_training if job.job_type == "training"
                          else self._run_inference)
                rc = runner(job, buf)
                if job_id in self._stop_requested:
                    job.status = JobStatus.STOPPED
                elif rc == 0:
                    job.status = JobStatus.COMPLETED
                    job.progress = 1.0
                else:
                    job.status = JobStatus.FAILED
                    job.error = job.error or f"exit code {rc}"
            except Exception as exc:  # pragma: no cover - defensive
                job.status = JobStatus.FAILED
                job.error = str(exc)
                logger.exception("job %s failed", job.id)
            finally:
                job.finished_at = time.time()
                if buf.progress is not None:
                    job.progress = buf.progress
                if job.status == JobStatus.COMPLETED:
                    job.progress = 1.0
                self._save(job)

        t = threading.Thread(target=safe_run, args=(job,), daemon=True)
        self._threads[job_id] = t
        t.start()
        return job

    def stop_job(self, job_id: str) -> Job:
        job = self._require(job_id)
        self._stop_requested.add(job_id)
        proc = self._procs.get(job_id)
        if proc is not None and proc.poll() is None:
            proc.terminate()
        return job

    def delete_job(self, job_id: str) -> bool:
        job = self._jobs.get(job_id)
        if job is not None and job.status == JobStatus.RUNNING:
            raise ValueError("Stop the job before deleting it")
        self._jobs.pop(job_id, None)
        self._logs.pop(job_id, None)
        return self.db.delete_job(job_id)

    def get_job_logs(self, job_id: str, after: int = 0) -> dict[str, Any]:
        job = self._require(job_id)
        lines, last = self._logs[job_id].get_lines(after)
        return {"lines": lines, "last": last,
                "progress": self._logs[job_id].progress or job.progress,
                "status": job.status.value}

    def wait(self, job_id: str, timeout: float | None = None) -> None:
        t = self._threads.get(job_id)
        if t is not None:
            t.join(timeout)

    def _require(self, job_id: str) -> Job:
        job = self._jobs.get(job_id)
        if job is None:
            raise KeyError(f"Unknown job {job_id}")
        return job

    # -- execution backends --------------------------------------------------

    def _run_training_subprocess(self, job: Job, buf: JobLogBuffer) -> int:
        os.makedirs(job.output_dir, exist_ok=True)
        cfg = build_training_config(job.config, job.output_dir)
        cfg_path = os.path.join(job.output_dir, "train_config.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=2)
        cmd = ["python", "-m", "fastvideo_tpu.entrypoints.cli.train",
               "--config", cfg_path]
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        self._procs[job.id] = proc
        assert proc.stdout is not None
        for line in proc.stdout:
            buf.write(line)
        rc = proc.wait()
        if rc == 0 and job.workload_type == "lora_t2v":
            rc = self._extract_lora(job, buf)
        return rc

    def _extract_lora(self, job: Job, buf: JobLogBuffer) -> int:
        """SVD-extract a LoRA from the finetuned weights vs the base
        (scripts/lora_extraction; replaces in-graph adapter training)."""
        rank = int(job.config.get("lora_rank", 32) or 32)
        cmd = ["python", "scripts/lora_extraction/extract_lora.py",
               "--base", job.model_id,
               "--ft", job.output_dir,
               "--rank", str(rank),
               "--out", os.path.join(job.output_dir, "lora")]
        buf.write(f"extracting LoRA (rank {rank})\n")
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        self._procs[job.id] = proc
        assert proc.stdout is not None
        for line in proc.stdout:
            buf.write(line)
        return proc.wait()

    def _run_inference_inline(self, job: Job, buf: JobLogBuffer) -> int:
        """Generate with VideoGenerator in-process (reference :828-940)."""
        from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

        os.makedirs(job.output_dir, exist_ok=True)
        cfg = job.config
        buf.write(f"loading {job.model_id}\n")
        gen = VideoGenerator.from_pretrained(job.model_id)
        buf.write("generating\n")
        # output_path is a DIRECTORY (file name comes from
        # output_video_name) — the /video endpoint serves
        # <output_dir>/output.mp4.
        gen.generate_video(
            cfg.get("prompt", ""),
            negative_prompt=cfg.get("negative_prompt"),
            num_inference_steps=int(cfg.get("num_inference_steps", 20)),
            height=int(cfg.get("height", 256)),
            width=int(cfg.get("width", 256)),
            num_frames=int(cfg.get("num_frames", 21)),
            seed=int(cfg.get("seed", 0)),
            output_path=job.output_dir,
            output_video_name="output.mp4")
        buf.write(f"saved {os.path.join(job.output_dir, 'output.mp4')}\n")
        return 0
