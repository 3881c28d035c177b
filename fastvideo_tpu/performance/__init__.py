"""Performance tracking: metric policies, local record store, dashboard.

Behavioral reference: /root/reference/fastvideo/performance/ +
performance_dashboard/ — rolling-baseline regression policies over
normalized benchmark records, served by a FastAPI dashboard backend.
Zero-egress deviation: records live in a local tracking root (JSON files)
instead of a HuggingFace dataset repo; ``refresh`` rescans disk.
"""

from fastvideo_tpu.performance.metric_policy import (DEFAULT_METRIC_POLICIES,
                                                     MetricDelta,
                                                     MetricPolicy,
                                                     regression_delta,
                                                     resolve_metric_policies)
from fastvideo_tpu.performance.store import (append_record, load_records,
                                             safe_float)

__all__ = [
    "MetricPolicy", "MetricDelta", "DEFAULT_METRIC_POLICIES",
    "resolve_metric_policies", "regression_delta", "append_record",
    "load_records", "safe_float",
]
