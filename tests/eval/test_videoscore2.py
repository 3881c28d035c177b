"""VideoScore2 parsing / soft-score math with an injected fake VLM
(reference eval/metrics/videoscore2/metric.py)."""

import numpy as np
import pytest


class _Tok:
    """Character-level fake tokenizer: id == ord(char)."""

    pad_token_id = 0

    def decode(self, ids, skip_special_tokens=False):
        return "".join(chr(i) for i in ids)

    def encode(self, text, add_special_tokens=False):
        return [ord(c) for c in text]


def _ids(text):
    return [ord(c) for c in text]


OUTPUT = ("<think>maybe 5?</think>\n"
          "(1) visual quality - clarity: 3\n"
          "(2) text-to-video alignment - fidelity: 4\n"
          "(3) physical/common-sense consistency - physics: 2\n")


def _scores_for(ids, peaked):
    """Uniform logits except digit positions peak at their own id."""
    v = 128
    scores = np.zeros((len(ids), v), np.float32)
    for i, tid in enumerate(ids):
        if chr(tid).isdigit() and peaked:
            scores[i, tid] = 4.0  # argmax = the emitted digit
    return scores


def test_regex_skips_chain_of_thought():
    from fastvideo_tpu.eval.suite.videoscore2 import SCORE_PATTERN

    m = SCORE_PATTERN.search(OUTPUT)
    assert m and [int(m.group(i)) for i in (1, 2, 3)] == [3, 4, 2]
    assert SCORE_PATTERN.search("no scores here") is None


def test_find_score_token_index_and_soft_score():
    from fastvideo_tpu.eval.suite.videoscore2 import (
        find_score_token_index, ll_based_soft_score_normed)

    tok = _Tok()
    ids = _ids(OUTPUT)
    idx_v = find_score_token_index("(1) visual quality", tok, ids)
    assert idx_v >= 0 and chr(ids[idx_v]) == "3"
    idx_t = find_score_token_index("(2) text-to-video alignment", tok, ids)
    assert chr(ids[idx_t]) == "4"
    assert find_score_token_index("(9) nope", tok, ids) == -1

    scores = _scores_for(ids, peaked=True)
    soft = ll_based_soft_score_normed(3, idx_v, scores, tok)
    # argmax digit is '3'; its share of the 1-5 digit mass is
    # e^4 / (e^4 + 4) ~ 0.9317 -> soft ~ 3 * 0.9317
    assert soft == pytest.approx(3 * (np.exp(4) / (np.exp(4) + 4)),
                                 abs=2e-3)
    assert ll_based_soft_score_normed(None, idx_v, scores, tok) is None
    assert ll_based_soft_score_normed(3, -1, scores, tok) is None


def test_subsample_frames():
    from fastvideo_tpu.eval.suite.videoscore2 import subsample_frames

    frames = np.zeros((32, 16, 16, 3), np.float32)
    # 32 frames @ 16 fps = 2 s -> 4 frames at infer_fps=2
    out = subsample_frames(frames, source_fps=16.0, infer_fps=2.0)
    assert len(out) == 4
    # no fps: capped evenly at max_frames
    out2 = subsample_frames(frames, None, 2.0, max_frames=8)
    assert len(out2) == 8


def test_metric_with_fake_backend():
    from fastvideo_tpu.eval.registry import _REGISTRY, load_builtin_metrics

    load_builtin_metrics()
    cls = _REGISTRY["videoscore2"]

    class FakeBackend:
        tokenizer = _Tok()

        def generate(self, prompt, frames, fps):
            assert "Video prompt: a red car" in prompt
            assert frames.ndim == 4
            ids = _ids(OUTPUT)
            return ids, _scores_for(ids, peaked=True)

    m = cls(backend=FakeBackend())
    res = m.compute({"video": np.zeros((8, 16, 16, 3), np.float32),
                     "text_prompt": "a red car", "fps": 8})
    d = res.details
    assert d["visual_quality_hard"] == 3
    assert d["text_alignment_hard"] == 4
    assert d["physical_consistency_hard"] == 2
    expected = np.mean([3, 4, 2]) * (np.exp(4) / (np.exp(4) + 4))
    assert res.score == pytest.approx(expected, abs=5e-3)


def test_gated_without_weights(monkeypatch):
    from fastvideo_tpu.eval.registry import missing_dependencies

    monkeypatch.delenv("FASTVIDEO_VIDEOSCORE2_WEIGHTS", raising=False)
    missing = missing_dependencies("videoscore2")
    assert any("FASTVIDEO_VIDEOSCORE2_WEIGHTS" in m for m in missing)
