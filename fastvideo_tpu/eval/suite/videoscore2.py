"""VideoScore2 — VLM-based 3-dimension video quality scoring.

Behavioral reference: /root/reference/fastvideo/eval/metrics/
videoscore2/metric.py (:1-331): the VS2 query template, the numbered-
list score regex anchored past the model's chain-of-thought, the
``ll_based_soft_score_normed`` logit weighting (argmax digit x its
share of the 1-5 digit probability mass), frame subsampling at
``infer_fps`` capped at 64 frames / 960 px, and the combined score =
mean of the available soft dimensions.

Backend: a pluggable object with ``.tokenizer`` and
``generate(prompt, frames_hwc, fps) -> (gen_ids, scores[T, V])`` —
tests inject a deterministic fake. The default backend loads the
released VideoScore2 (Qwen2.5-VL) checkpoint from a LOCAL path
($FASTVIDEO_VIDEOSCORE2_WEIGHTS) via transformers, greedy decode with
per-step logits (zero-egress gate, like the reference's dependency
gate on qwen_vl_utils).
"""

from __future__ import annotations

import os
import re
from string import Template
from typing import Any

import numpy as np

from fastvideo_tpu.eval.base import BaseMetric
from fastvideo_tpu.eval.registry import register
from fastvideo_tpu.eval.types import MetricResult

# Matches the upstream template (reference :27-39).
VS2_QUERY_TEMPLATE = Template("""
    You are an expert for evaluating AI-generated videos from three dimensions:
    (1) visual quality – clarity, smoothness, artifacts;
    (2) text-to-video alignment – fidelity to the prompt;
    (3) physical/common-sense consistency – naturalness and physics plausibility.

    Video prompt: $t2v_prompt

    Please output in this format:
    visual quality: <v_score>;
    text-to-video alignment: <t_score>,
    physical/common-sense consistency: <p_score>
    """)

# Anchored on the numbered list so chain-of-thought digits don't match
# (reference :41-58 and its note on upstream's broken regex).
SCORE_PATTERN = re.compile(
    r"\(1\)\s*visual quality[^\d]*?(\d+).*?"
    r"\(2\)\s*text-to-video alignment[^\d]*?(\d+).*?"
    r"\(3\)\s*physical/common-sense consistency[^\d]*?(\d+)",
    re.DOTALL | re.IGNORECASE)


def find_score_token_index(prompt_text: str, tokenizer,
                           gen_ids: list[int]) -> int:
    """Token index of the score digit following ``prompt_text``
    (reference :61-77)."""
    gen_str = tokenizer.decode(gen_ids, skip_special_tokens=False)
    pattern = r"(?:\(\d+\)\s*|\n\s*)?" + re.escape(prompt_text)
    match = re.search(pattern, gen_str, flags=re.IGNORECASE)
    if not match:
        return -1
    after = gen_str[match.end():]
    num = re.search(r"\d", after)
    if not num:
        return -1
    target = gen_str[:match.end() + num.start() + 1]
    for i in range(len(gen_ids)):
        if tokenizer.decode(gen_ids[:i + 1],
                            skip_special_tokens=False) == target:
            return i
    return -1


def ll_based_soft_score_normed(hard_val: int | None, token_idx: int,
                               scores: np.ndarray,
                               tokenizer) -> float | None:
    """argmax score x (argmax prob / sum of 1-5 digit probs)
    (reference :80-106)."""
    if hard_val is None or token_idx < 0 or token_idx >= len(scores):
        return None
    logits = np.asarray(scores[token_idx], np.float64)
    logits = logits - logits.max()
    probs = np.exp(logits)
    probs = probs / probs.sum()
    score_probs = []
    for s in range(1, 6):
        ids = tokenizer.encode(str(s), add_special_tokens=False)
        if len(ids) == 1:
            score_probs.append((s, float(probs[ids[0]])))
    if not score_probs:
        return None
    vals, ps = zip(*score_probs)
    total = sum(ps)
    max_p = max(ps)
    best = vals[ps.index(max_p)]
    normed = max_p / total if total > 0 else 0.0
    return round(best * normed, 4)


def parse_output(output_text: str, scores: np.ndarray | None,
                 tokenizer, gen_ids: list[int]) -> dict:
    """Hard regex scores + per-dimension soft scores (reference :109-139)."""
    m = SCORE_PATTERN.search(output_text)
    v_hard = int(m.group(1)) if m else None
    t_hard = int(m.group(2)) if m else None
    p_hard = int(m.group(3)) if m else None
    if scores is not None:
        idx_v = find_score_token_index("(1) visual quality", tokenizer,
                                       gen_ids)
        idx_t = find_score_token_index("(2) text-to-video alignment",
                                       tokenizer, gen_ids)
        idx_p = find_score_token_index(
            "(3) physical/common-sense consistency", tokenizer, gen_ids)
        v_soft = ll_based_soft_score_normed(v_hard, idx_v, scores,
                                            tokenizer)
        t_soft = ll_based_soft_score_normed(t_hard, idx_t, scores,
                                            tokenizer)
        p_soft = ll_based_soft_score_normed(p_hard, idx_p, scores,
                                            tokenizer)
    else:
        v_soft = float(v_hard) if v_hard is not None else None
        t_soft = float(t_hard) if t_hard is not None else None
        p_soft = float(p_hard) if p_hard is not None else None
    return {
        "visual_quality": v_soft,
        "text_alignment": t_soft,
        "physical_consistency": p_soft,
        "visual_quality_hard": v_hard,
        "text_alignment_hard": t_hard,
        "physical_consistency_hard": p_hard,
        "raw_output": output_text,
    }


def subsample_frames(frames: np.ndarray, source_fps: float | None,
                     infer_fps: float, max_frames: int = 64,
                     max_resolution: int = 960) -> np.ndarray:
    """[T, H, W, C] -> infer_fps sampling capped at max_frames / 960px
    (reference _subsample_frames :220-247)."""
    n = len(frames)
    if source_fps is not None and source_fps > 0:
        duration = n / source_fps
        target = max(1, min(max_frames, int(round(duration * infer_fps))))
    else:
        target = min(n, max_frames)
    if target < n:
        idx = np.linspace(0, n - 1, target, dtype=int)
        frames = frames[idx]
    h, w = frames.shape[1:3]
    if max(h, w) > max_resolution:
        import PIL.Image

        scale = max_resolution / max(h, w)
        nh, nw = int(h * scale), int(w * scale)
        frames = np.stack([
            np.asarray(PIL.Image.fromarray(
                (np.clip(f, 0, 1) * 255).astype(np.uint8)).resize(
                    (nw, nh), PIL.Image.LANCZOS), np.float32) / 255.0
            for f in frames])
    return frames


class TransformersVS2Backend:
    """Default backend: the released VideoScore2 checkpoint from a
    local dir (zero-egress gate on $FASTVIDEO_VIDEOSCORE2_WEIGHTS)."""

    def __init__(self, model_path: str | None = None,
                 max_tokens: int = 1024):
        model_path = model_path or os.getenv(
            "FASTVIDEO_VIDEOSCORE2_WEIGHTS", "")
        if not model_path or not os.path.exists(model_path):
            raise FileNotFoundError(
                "VideoScore2 needs the released TIGER-Lab/VideoScore2 "
                "checkpoint on local disk; set "
                "FASTVIDEO_VIDEOSCORE2_WEIGHTS")
        import torch
        from transformers import AutoProcessor, AutoTokenizer

        try:
            from transformers import AutoModelForImageTextToText as AM
        except ImportError:  # pragma: no cover - transformers version
            from transformers import AutoModelForVision2Seq as AM

        self.model = AM.from_pretrained(model_path,
                                        trust_remote_code=True,
                                        dtype=torch.bfloat16).eval()
        self.processor = AutoProcessor.from_pretrained(
            model_path, trust_remote_code=True)
        self.tokenizer = getattr(self.processor, "tokenizer", None) or \
            AutoTokenizer.from_pretrained(model_path,
                                          trust_remote_code=True)
        self.max_tokens = max_tokens

    def generate(self, prompt: str, frames_hwc: np.ndarray,
                 fps: float) -> tuple[list[int], np.ndarray]:
        import PIL.Image
        import torch

        pil = [PIL.Image.fromarray(
            (np.clip(f, 0, 1) * 255).astype(np.uint8))
            for f in frames_hwc]
        messages = [{"role": "user", "content": [
            {"type": "video", "video": pil, "fps": fps},
            {"type": "text", "text": prompt}]}]
        chat = self.processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True)
        inputs = self.processor(text=[chat], videos=[pil], fps=fps,
                                padding=True, return_tensors="pt")
        with torch.no_grad():
            out = self.model.generate(**inputs,
                                      max_new_tokens=self.max_tokens,
                                      output_scores=True,
                                      return_dict_in_generate=True,
                                      do_sample=False)
        input_len = inputs["input_ids"].shape[1]
        gen_ids = out.sequences[0, input_len:].tolist()
        pad = self.tokenizer.pad_token_id
        if pad is not None:
            gen_ids = [t for t in gen_ids if t != pad]
        scores = np.stack([s[0].float().cpu().numpy()
                           for s in out.scores])
        return gen_ids, scores


@register("videoscore2")
class VideoScore2Metric(BaseMetric):
    """Combined = mean of available soft dims (reference :322-331)."""

    requires_reference = False
    weights_env = "FASTVIDEO_VIDEOSCORE2_WEIGHTS"

    def __init__(self, infer_fps: float = 2.0, backend: Any = None):
        self.infer_fps = float(infer_fps)
        self._backend = backend
        if backend is not None:
            self.weights_env = None  # injected backend: no gate

    def setup(self) -> None:
        if self._backend is None:
            self._backend = TransformersVS2Backend()

    def compute(self, sample: dict) -> MetricResult:
        video = sample.get("video")
        if video is None:
            return self._skip("missing sample['video']")
        self.setup()
        text = sample.get("text_prompt", "")
        if isinstance(text, list):
            text = text[0] if text else ""
        frames = subsample_frames(
            np.asarray(video, np.float32),
            float(sample["fps"]) if sample.get("fps") else None,
            self.infer_fps)
        prompt = VS2_QUERY_TEMPLATE.substitute(t2v_prompt=text)
        gen_ids, scores = self._backend.generate(prompt, frames,
                                                 self.infer_fps)
        output_text = self._backend.tokenizer.decode(
            gen_ids, skip_special_tokens=True)
        parsed = parse_output(output_text, scores,
                              self._backend.tokenizer, gen_ids)
        soft = [v for v in (parsed["visual_quality"],
                            parsed["text_alignment"],
                            parsed["physical_consistency"])
                if v is not None]
        combined = sum(soft) / len(soft) if soft else 0.0
        return MetricResult(name=self.name, score=combined, details=parsed)
