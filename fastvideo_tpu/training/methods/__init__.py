"""Training method plugin registry.

Importing this package registers the built-in methods (the reference's
train/methods/ families); external methods register via the
``@register_method`` decorator or are resolved by dotted ``_target_`` path.
"""

from fastvideo_tpu.training.methods.base import (PipelineMethod,
                                                 TrainingMethod,
                                                 list_methods,
                                                 register_method,
                                                 resolve_method)

# built-in method families (import => register)
from fastvideo_tpu.training.methods import fine_tuning  # noqa: F401
from fastvideo_tpu.training.methods import distribution_matching  # noqa: F401
from fastvideo_tpu.training.methods import knowledge_distillation  # noqa: F401
from fastvideo_tpu.training.methods import anyflow  # noqa: F401
from fastvideo_tpu.training.methods import anyflow_pretrain  # noqa: F401
from fastvideo_tpu.training.methods import causal_cd  # noqa: F401
from fastvideo_tpu.training.methods import lora  # noqa: F401
from fastvideo_tpu.training.methods import rl  # noqa: F401

__all__ = [
    "TrainingMethod",
    "PipelineMethod",
    "register_method",
    "resolve_method",
    "list_methods",
]
