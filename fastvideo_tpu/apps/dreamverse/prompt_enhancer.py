"""Prompt enhancement / prompt-window rewriting.

Behavior analog of /root/reference/apps/dreamverse/dreamverse/
prompt_enhancer.py (:68-1290): staged provider fallback (try each
provider in a stage concurrently-in-order, fall through to the next
stage), enhance (single prompt -> cinematic prompt) and rewrite
(prompt window -> per-segment prompt list) with the reference's
tolerant output parsing — JSON ``segment_prompts``, indexed keys
(``segment_1`` ...), and numbered plain-text lists all resolve.

Zero-egress deviation: providers are pluggable callables
``(system_prompt, user_prompt, timeout_s) -> str`` instead of HTTP LLM
clients; without any provider the enhancer falls back to rule-based
pass-through (never blocks a session on a missing LLM).
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

Provider = Callable[[str, str, float], str]

ENHANCE_SYSTEM_PROMPT = (
    "You are a film director's assistant. Rewrite the user's idea as one "
    "vivid, concrete video-generation prompt: subject, action, setting, "
    "camera, lighting. Reply with JSON {\"prompt\": \"...\"}.")

REWRITE_SYSTEM_PROMPT = (
    "You continue an interactive video story. Given the story so far and "
    "the user's new direction, write one prompt per upcoming segment. "
    "Reply with JSON {\"segment_prompts\": [\"...\"]}.")


@dataclass
class EnhanceResult:
    """Reference :68-76."""

    prompt: str
    source: str                  # provider name | "fallback"
    fallback_used: bool = False
    latency_ms: float = 0.0


@dataclass
class RewriteResult:
    """Reference :78-88."""

    segment_prompts: list[str]
    source: str
    fallback_used: bool = False
    latency_ms: float = 0.0


@dataclass
class ProviderRuntime:
    name: str
    call: Provider
    stage: int = 0
    success_count: int = field(default=0, compare=False)


def _normalize_prompt_item(item: Any) -> str | None:
    """Reference _normalize_rewrite_prompt_item (:1062-1079)."""
    if isinstance(item, str):
        return item.strip() or None
    if not isinstance(item, dict):
        return None
    for key in ("prompt", "text", "segment_prompt", "content",
                "description"):
        value = item.get(key)
        if isinstance(value, str) and value.strip():
            return value.strip()
    return None


def extract_indexed_prompts(parsed: dict[str, Any],
                            expected_len: int) -> list[str] | None:
    """``segment_1``/``prompt 2``/``shot-3`` keys -> ordered list
    (reference :1100-1126)."""
    indexed: dict[int, str] = {}
    for key, value in parsed.items():
        if not isinstance(key, str):
            continue
        m = re.fullmatch(r"(?:segment|prompt|scene|shot)[ _-]?(\d+)",
                         key.strip(), flags=re.IGNORECASE)
        if not m:
            continue
        idx = int(m.group(1))
        if not 1 <= idx <= expected_len:
            continue
        normalized = _normalize_prompt_item(value)
        if normalized is None:
            return None
        indexed[idx] = normalized
    if any(i not in indexed for i in range(1, expected_len + 1)):
        return None
    return [indexed[i] for i in range(1, expected_len + 1)]


def extract_numbered_prompts_from_text(content: str,
                                       expected_len: int
                                       ) -> list[str] | None:
    """Numbered plain-text list -> ordered prompts, continuation lines
    folded into the current item (reference :1128-1190)."""
    segments: dict[int, list[str]] = {}
    current: int | None = None
    for raw in content.splitlines():
        line = raw.strip()
        if not line:
            continue
        line = re.sub(r"^\s*[-*]\s*", "", line)
        m = re.match(r"^(?:\*\*)?(?:segment|scene|shot|prompt)?"
                     r"\s*[_ -]?(\d+)(?:\*\*)?\s*[:.)-]\s*(.+)$",
                     line, flags=re.IGNORECASE)
        if m:
            idx = int(m.group(1))
            if 1 <= idx <= expected_len:
                segments[idx] = [m.group(2).strip()]
                current = idx
                continue
        if current is not None:
            segments[current].append(line)
    if any(i not in segments for i in range(1, expected_len + 1)):
        return None
    return [" ".join(segments[i]) for i in range(1, expected_len + 1)]


def parse_rewrite_response(content: str,
                           expected_len: int) -> list[str] | None:
    """All tolerated output shapes, in the reference's priority order."""
    content = content.strip()
    parsed: Any = None
    # tolerate ```json fences
    fenced = re.search(r"```(?:json)?\s*(.*?)```", content, re.DOTALL)
    for candidate in ([fenced.group(1)] if fenced else []) + [content]:
        try:
            parsed = json.loads(candidate)
            break
        except json.JSONDecodeError:
            continue
    if isinstance(parsed, dict):
        prompts = parsed.get("segment_prompts")
        if isinstance(prompts, list):
            normalized = [_normalize_prompt_item(p) for p in prompts]
            if None not in normalized and len(normalized) == expected_len:
                return normalized  # type: ignore[return-value]
        indexed = extract_indexed_prompts(parsed, expected_len)
        if indexed is not None:
            return indexed
    if isinstance(parsed, list):
        normalized = [_normalize_prompt_item(p) for p in parsed]
        if None not in normalized and len(normalized) == expected_len:
            return normalized  # type: ignore[return-value]
    return extract_numbered_prompts_from_text(content, expected_len)


def parse_enhance_response(content: str) -> str | None:
    content = content.strip()
    fenced = re.search(r"```(?:json)?\s*(.*?)```", content, re.DOTALL)
    for candidate in ([fenced.group(1)] if fenced else []) + [content]:
        try:
            parsed = json.loads(candidate)
        except json.JSONDecodeError:
            continue
        if isinstance(parsed, dict):
            value = parsed.get("prompt") or parsed.get("enhanced_prompt")
            if isinstance(value, str) and value.strip():
                return value.strip()
    # plain-text reply counts when it isn't JSON at all
    if content and not content.startswith(("{", "[")):
        return content
    return None


class CausalLMProvider:
    """Local-LM provider over :class:`fastvideo_tpu.models.lm.CausalLM`.

    Zero-egress replacement for the reference's HTTP LLM providers: the
    enhancer runs on-box on the repo's own decode runtime. Construct
    from a live (lm, tokenizer) pair, or from a local checkpoint dir
    via :meth:`from_checkpoint` (gated like every other local-weights
    path)."""

    def __init__(self, lm, tokenizer, max_new_tokens: int = 256,
                 temperature: float = 0.0):
        self.lm = lm
        self.tokenizer = tokenizer
        self.max_new_tokens = int(max_new_tokens)
        self.temperature = float(temperature)

    @classmethod
    def from_checkpoint(cls, path: str | None = None,
                        **kwargs) -> "CausalLMProvider":
        import os

        from fastvideo_tpu.models.lm import CausalLM
        from fastvideo_tpu.models.loader.component_loader import (
            load_model_component)

        path = path or os.getenv("FASTVIDEO_ENHANCER_LM_WEIGHTS", "")
        if not path or not os.path.exists(path):
            raise FileNotFoundError(
                "CausalLMProvider needs a local LM checkpoint dir "
                "(trunk components + tokenizer/); set "
                "FASTVIDEO_ENHANCER_LM_WEIGHTS")
        from transformers import AutoTokenizer

        trunk = load_model_component(os.path.join(path, "text_encoder"))
        tokenizer = AutoTokenizer.from_pretrained(
            os.path.join(path, "tokenizer"))
        return cls(CausalLM(trunk, tie_word_embeddings=True), tokenizer,
                   **kwargs)

    def __call__(self, system_prompt: str, user_prompt: str,
                 timeout_s: float) -> str:
        # The decode is one jitted scan dispatch and cannot be cancelled
        # mid-flight, but the CALLER's deadline is still honoured: run it
        # on a worker thread and raise TimeoutError past the deadline so
        # the staged enhancer falls back instead of hanging the session.
        import threading

        result: list[str] = []
        error: list[BaseException] = []

        def _decode():
            try:
                result.append(self._generate(system_prompt, user_prompt))
            except BaseException as exc:  # surfaced to the caller below
                error.append(exc)

        # non-daemon: a timed-out decode finishes in the background (the
        # dispatch can't be cancelled); killing it at interpreter exit
        # mid-XLA aborts the process.
        t = threading.Thread(target=_decode, daemon=False)
        t.start()
        t.join(timeout=max(0.1, float(timeout_s)))
        if t.is_alive():
            raise TimeoutError(
                f"local LM enhance exceeded {timeout_s:.1f}s deadline")
        if error:
            raise error[0]
        return result[0]

    def _generate(self, system_prompt: str, user_prompt: str) -> str:
        import jax
        import jax.numpy as jnp
        import numpy as np

        text = f"{system_prompt}\n\n{user_prompt}\n"
        toks = self.tokenizer(text, return_tensors="np")
        ids = jnp.asarray(toks["input_ids"])
        mask = jnp.ones_like(ids)
        eos = getattr(self.tokenizer, "eos_token_id", None)
        res = self.lm.generate(ids, mask,
                               max_new_tokens=self.max_new_tokens,
                               eos_token_id=eos,
                               temperature=self.temperature,
                               key=jax.random.PRNGKey(0))
        n = int(res.num_tokens[0])
        out_ids = list(np.asarray(res.tokens)[0, :n])
        if eos is not None and out_ids and out_ids[-1] == eos:
            out_ids = out_ids[:-1]
        return self.tokenizer.decode(out_ids, skip_special_tokens=True)


class PromptEnhancer:
    """Staged-provider enhancer (reference :382-1006)."""

    def __init__(self, providers: Sequence[ProviderRuntime] = (),
                 timeout_s: float = 8.0):
        self.providers = list(providers)
        self.timeout_s = float(timeout_s)

    def add_provider(self, name: str, call: Provider,
                     stage: int = 0) -> None:
        self.providers.append(ProviderRuntime(name=name, call=call,
                                              stage=stage))

    def provider_success_counts(self) -> dict[str, int]:
        return {p.name: p.success_count for p in self.providers}

    def _stages(self) -> list[list[ProviderRuntime]]:
        stages: dict[int, list[ProviderRuntime]] = {}
        for p in self.providers:
            stages.setdefault(p.stage, []).append(p)
        return [stages[k] for k in sorted(stages)]

    def _run_staged(self, system_prompt: str, user_prompt: str,
                    parse: Callable[[str], Any]) -> tuple[Any, str]:
        for stage in self._stages():
            for provider in stage:
                try:
                    raw = provider.call(system_prompt, user_prompt,
                                        self.timeout_s)
                except Exception as exc:
                    logger.warning("provider %s failed: %s", provider.name,
                                   exc)
                    continue
                parsed = parse(raw)
                if parsed is not None:
                    provider.success_count += 1
                    return parsed, provider.name
        return None, "fallback"

    def enhance(self, prompt: str) -> EnhanceResult:
        t0 = time.perf_counter()
        parsed, source = self._run_staged(
            ENHANCE_SYSTEM_PROMPT, prompt, parse_enhance_response)
        ms = (time.perf_counter() - t0) * 1000
        if parsed is None:
            return EnhanceResult(prompt=prompt.strip(), source="fallback",
                                 fallback_used=True, latency_ms=ms)
        return EnhanceResult(prompt=parsed, source=source, latency_ms=ms)

    def rewrite_window(self, story_so_far: str, direction: str,
                       num_segments: int) -> RewriteResult:
        user = (f"Story so far:\n{story_so_far}\n\nNew direction: "
                f"{direction}\n\nWrite {num_segments} segment prompts.")
        t0 = time.perf_counter()
        parsed, source = self._run_staged(
            REWRITE_SYSTEM_PROMPT, user,
            lambda raw: parse_rewrite_response(raw, num_segments))
        ms = (time.perf_counter() - t0) * 1000
        if parsed is None:
            # fallback: repeat the direction for every segment
            return RewriteResult(
                segment_prompts=[direction.strip()] * num_segments,
                source="fallback", fallback_used=True, latency_ms=ms)
        return RewriteResult(segment_prompts=parsed, source=source,
                             latency_ms=ms)
