"""Attention backend selection.

Mirrors the reference resolution order
(/root/reference/fastvideo/attention/selector.py:23-100): explicit request >
component scope > ``FASTVIDEO_ATTENTION_BACKEND`` env var > platform default;
fail-fast on unknown names. Platform default is FLASH_ATTN (Pallas) on TPU
and TORCH_SDPA (XLA) on CPU.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax

from fastvideo_tpu import envs
from fastvideo_tpu.attention.backends.abstract import AttentionBackend
from fastvideo_tpu.attention.backends.flash import FlashAttentionBackend
from fastvideo_tpu.attention.backends.sdpa import SDPABackend
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

_BACKENDS: dict[str, type[AttentionBackend]] = {}


def register_backend(cls: type[AttentionBackend]) -> type[AttentionBackend]:
    _BACKENDS[cls.name] = cls
    return cls


register_backend(SDPABackend)
register_backend(FlashAttentionBackend)

from fastvideo_tpu.attention.backends.sta import (  # noqa: E402
    SlidingTileAttentionBackend)
from fastvideo_tpu.attention.backends.vsa import (  # noqa: E402
    VideoSparseAttentionBackend)

register_backend(VideoSparseAttentionBackend)
register_backend(SlidingTileAttentionBackend)

from fastvideo_tpu.attention.backends.sage import (  # noqa: E402
    SageAttentionBackend)

register_backend(SageAttentionBackend)

from fastvideo_tpu.attention.backends.nabla import (  # noqa: E402
    NablaAttentionBackend)

register_backend(NablaAttentionBackend)

from fastvideo_tpu.attention.backends.sla import (  # noqa: E402
    SLAAttentionBackend)

register_backend(SLAAttentionBackend)

from fastvideo_tpu.attention.backends.bsa import (  # noqa: E402
    BSAAttentionBackend)

register_backend(BSAAttentionBackend)

from fastvideo_tpu.attention.backends.vmoba import (  # noqa: E402
    VMOBAAttentionBackend)

register_backend(VMOBAAttentionBackend)

from fastvideo_tpu.attention.backends.attn_qat import (  # noqa: E402
    AttnQatTrainBackend)

register_backend(AttnQatTrainBackend)

# Aliases for reference-compatible names.
_ALIASES = {
    "SDPA": "TORCH_SDPA",
    "FLASH_ATTN_2": "FLASH_ATTN",
    "FLASH_ATTN_3": "FLASH_ATTN",
    "PALLAS_FLASH": "FLASH_ATTN",
    # SAGE3's Blackwell-FP4 microscaling has no v5e hardware grid; the
    # int8 per-block SAGE path is the TPU analog of both names.
    "SAGE_ATTN_THREE": "SAGE_ATTN",
    "ATTN_QAT": "SAGE_ATTN",  # serving-side int8 (train side: ATTN_QAT_TRAIN)
    "NABLA": "NABLA_ATTN",
    "VMOBA": "VMOBA_ATTN",
    "BSA": "BSA_ATTN",
    "SLA": "SLA_ATTN",
}

_scope_backend: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "attn_backend_scope", default=None)


@contextlib.contextmanager
def attention_backend_scope(name: str | None):
    """Scoped override, analog of the reference's per-component context var."""
    token = _scope_backend.set(name)
    try:
        yield
    finally:
        _scope_backend.reset(token)


def _platform_default() -> str:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    if platform == "cpu":
        return "TORCH_SDPA"
    return "FLASH_ATTN"


def resolve_backend_name(requested: str | None = None) -> str:
    name = (requested or _scope_backend.get()
            or envs.FASTVIDEO_ATTENTION_BACKEND or _platform_default())
    name = _ALIASES.get(name, name)
    if name not in _BACKENDS:
        raise ValueError(
            f"Unknown attention backend {name!r}. Known: {sorted(_BACKENDS)}")
    return name


def get_attn_backend(
    num_heads: int,
    head_size: int,
    *,
    softmax_scale: float | None = None,
    causal: bool = False,
    requested: str | None = None,
    supported: tuple[str, ...] | None = None,
    **extra,
) -> AttentionBackend:
    name = resolve_backend_name(requested)
    if supported and name not in supported and requested is None:
        # Auto-selected backend unsupported by this layer: fall back.
        for cand in supported:
            if cand in _BACKENDS:
                name = cand
                break
    cls = _BACKENDS[name]
    return cls(num_heads, head_size, softmax_scale, causal, **extra)
