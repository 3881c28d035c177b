from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)
from fastvideo_tpu.attention.layer import DistributedAttention, LocalAttention
from fastvideo_tpu.attention.selector import (attention_backend_scope,
                                              get_attn_backend,
                                              register_backend,
                                              resolve_backend_name)

__all__ = [
    "AttentionBackend",
    "AttentionMetadata",
    "DistributedAttention",
    "LocalAttention",
    "get_attn_backend",
    "register_backend",
    "resolve_backend_name",
    "attention_backend_scope",
]
