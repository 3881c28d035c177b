from fastvideo_tpu.workflow.workflow_base import WorkflowBase

__all__ = ["WorkflowBase"]
