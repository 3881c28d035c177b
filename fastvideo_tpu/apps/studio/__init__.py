"""FastVideo Studio: local training/inference job manager.

Behavior analog of /root/reference/apps/fastvideo_studio/: a FastAPI
server over a sqlite job+dataset store and a threaded job runner that
launches training runs through the ``fastvideo train`` entrypoint and
inference through ``VideoGenerator``.
"""

from fastvideo_tpu.apps.studio.database import Database, default_settings
from fastvideo_tpu.apps.studio.job_runner import (Job, JobLogBuffer,
                                                  JobRunner, JobStatus)
from fastvideo_tpu.apps.studio.training_config import (SUPPORTED_WORKLOADS,
                                                       build_training_config)

__all__ = [
    "Database",
    "Job",
    "JobLogBuffer",
    "JobRunner",
    "JobStatus",
    "SUPPORTED_WORKLOADS",
    "build_training_config",
    "default_settings",
]
