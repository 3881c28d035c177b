"""Autoregressive language-model runtime (KV-cache decode).

Used by the VLM-judge eval metrics (VideoScore2) and available as a
local prompt-enhancer backend.
"""

from fastvideo_tpu.models.lm.causal_lm import CausalLM, GenerationResult

__all__ = ["CausalLM", "GenerationResult"]
