"""Prompt safety filtering.

Behavior analog of /root/reference/apps/dreamverse/dreamverse/
prompt_safety.py: fasttext NSFW/violence classifiers resolved from
``LTX2_CLASSIFIER_DIR``-style env paths, returning the first blocked
prompt with a user-facing error. Zero-egress deviation: when the
``fasttext`` package or classifier files are absent, a conservative
keyword-rule fallback runs instead of raising at import time — the
filter is always available, and the classifier path upgrades it.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from functools import lru_cache

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

_BLOCK_PATTERNS = [
    # minimal conservative fallback rules; the fasttext classifiers are
    # authoritative when installed
    re.compile(r"\b(nsfw|explicit|gore|beheading)\b", re.IGNORECASE),
]

_BLOCK_MESSAGE = ("This prompt was blocked by the content filter. "
                  "Please rephrase and try again.")


@dataclass(frozen=True)
class BlockedPrompt:
    """Reference prompt_safety.py:18-22."""

    index: int
    prompt: str
    error: str


def resolve_classifier_path(env_var: str, filename: str) -> str | None:
    """First existing candidate among env override and the classifier
    dir (reference :31-57; missing files return None instead of
    raising — the rule fallback covers them)."""
    candidates = []
    env_path = os.getenv(env_var, "")
    if env_path:
        candidates.append(os.path.expanduser(os.path.expandvars(env_path)))
    base = os.getenv("LTX2_CLASSIFIER_DIR", "")
    if base:
        candidates.append(os.path.join(os.path.expanduser(base), filename))
    for cand in candidates:
        if os.path.isfile(cand):
            return cand
    return None


@lru_cache(maxsize=4)
def _load_fasttext(path: str):
    import fasttext  # dependency-gated

    return fasttext.load_model(path)


class PromptSafetyFilter:
    """Classifies prompts; fasttext when available, keyword rules
    otherwise."""

    def __init__(self, nsfw_threshold: float = 0.8,
                 classifier_path: str | None = None):
        self.nsfw_threshold = float(nsfw_threshold)
        self.classifier_path = classifier_path or resolve_classifier_path(
            "LTX2_NSFW_CLASSIFIER_PATH", "nsfw_classifier.bin")

    def _classify_fasttext(self, prompt: str) -> str | None:
        model = _load_fasttext(self.classifier_path)
        labels, probs = model.predict(prompt.replace("\n", " "))
        if not labels:
            return None
        label = str(labels[0])
        if "unsafe" in label or "nsfw" in label:
            if float(probs[0]) >= self.nsfw_threshold:
                return _BLOCK_MESSAGE
        return None

    def get_prompt_safety_error(self, prompt: str) -> str | None:
        """None when safe; a user-facing error string when blocked."""
        if self.classifier_path:
            try:
                return self._classify_fasttext(prompt)
            except Exception as exc:
                # Any classifier failure (missing fasttext, corrupt .bin,
                # predict error) degrades to the rule fallback instead of
                # erroring every prompt in every session.
                logger.warning(
                    "fasttext safety classifier unavailable (%s); "
                    "falling back to keyword rules", exc)
                # lru_cache only caches successful loads — disable the
                # classifier so a corrupt .bin isn't re-parsed per prompt.
                self.classifier_path = ""
        for pat in _BLOCK_PATTERNS:
            if pat.search(prompt):
                return _BLOCK_MESSAGE
        return None

    def get_first_blocked_prompt(
            self, prompts: list[str]) -> BlockedPrompt | None:
        """Reference :138-150 — first offending prompt or None."""
        for idx, prompt in enumerate(prompts):
            error = self.get_prompt_safety_error(prompt)
            if error is not None:
                return BlockedPrompt(index=idx, prompt=prompt, error=error)
        return None
