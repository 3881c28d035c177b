"""Audio eval metrics: CLAP score, Fréchet audio distance, KL, WER.

Behavioral reference: /root/reference/fastvideo/eval/metrics/audio/
(clap_score, frechet_distance, kl_divergence, wer). Zero-egress
adaptations:

* clap_score: HF ``ClapModel`` loaded from a LOCAL dir
  ($FASTVIDEO_CLAP_WEIGHTS) — the reference pulls laion/clap-htsat-fused
  from the hub. Same peak-normalised 48 kHz mono input and cosine score.
* frechet_distance: same Fréchet formula as the reference's FD_PaSST
  (:36-58), but the default embedder is a self-contained log-mel
  statistics embedding (mean ‖ std over time per mel band) since PaSST
  weights can't be downloaded; pass extractor="clap" (weights-gated) for
  a learned embedding space.
* kl_divergence: the reference KLs paired PaSST label logits; here the
  paired distributions are softmaxed log-mel band energies — label-free
  but the same paired gen-vs-ref KL protocol.
* wer: HF Whisper from a LOCAL dir ($FASTVIDEO_ASR_WEIGHTS) +
  standard Levenshtein word error rate.

Audio enters as ``sample["video_audio"]``/``sample["reference_audio"]``
(float waveform + ``*_audio_sr``), which the worker populates from Video
handles (.wav sources or tracks the pool decoded).
"""

from __future__ import annotations

import os

import numpy as np

from fastvideo_tpu.eval.base import BaseMetric
from fastvideo_tpu.eval.registry import register
from fastvideo_tpu.eval.types import MetricResult

_CLAP_SR = 48000
_MEL_SR = 16000


def resample(audio: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return audio
    from fractions import Fraction

    from scipy.signal import resample_poly

    frac = Fraction(target_sr, sr).limit_denominator(1000)
    return resample_poly(audio, frac.numerator, frac.denominator, axis=0)


def to_mono(audio: np.ndarray) -> np.ndarray:
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 2:
        audio = audio.mean(axis=-1 if audio.shape[-1] <= 8 else 0)
    return audio


def peak_normalize(audio: np.ndarray, peak_db: float = -1.0) -> np.ndarray:
    peak = np.abs(audio).max()
    if peak < 1e-9:
        return audio
    return audio * (10.0**(peak_db / 20.0) / peak)


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0**(np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None
                   ) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2+1] (HTK scale)."""
    fmax = fmax or sr / 2.0
    mels = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    freqs = _mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, bins.shape[0]), np.float32)
    for i in range(n_mels):
        lo, ctr, hi = freqs[i], freqs[i + 1], freqs[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-9)
        down = (hi - bins) / max(hi - ctr, 1e-9)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def log_mel_spectrogram(audio: np.ndarray, sr: int, *, n_fft: int = 1024,
                        hop: int = 256, n_mels: int = 64) -> np.ndarray:
    """[samples] → [frames, n_mels] log-mel energies."""
    audio = to_mono(audio)
    if audio.shape[0] < n_fft:
        audio = np.pad(audio, (0, n_fft - audio.shape[0]))
    n_frames = 1 + (audio.shape[0] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = audio[idx] * np.hanning(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=-1))**2
    fb = mel_filterbank(sr, n_fft, n_mels)
    return np.log(power @ fb.T + 1e-8).astype(np.float32)


def mel_stats_embedding(audio: np.ndarray, sr: int,
                        n_mels: int = 64) -> np.ndarray:
    """Self-contained [2*n_mels] embedding: per-band mean ‖ std of the
    log-mel spectrogram (the zero-egress stand-in for PaSST embeds)."""
    audio = peak_normalize(to_mono(audio))
    audio = resample(audio, sr, _MEL_SR)
    mel = log_mel_spectrogram(audio, _MEL_SR, n_mels=n_mels)
    return np.concatenate([mel.mean(axis=0), mel.std(axis=0)])


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d² = ‖mu1-mu2‖² + Tr(s1 + s2 - 2·sqrt(s1·s2))."""
    from scipy import linalg

    sigma1 = np.atleast_2d(sigma1) + eps * np.eye(len(mu1))
    sigma2 = np.atleast_2d(sigma2) + eps * np.eye(len(mu2))
    diff = np.asarray(mu1) - np.asarray(mu2)
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) -
                 2 * np.trace(covmean))


def _sample_audio(sample: dict, key: str = "video"):
    """(waveform, sr) for 'video' or 'reference', or (None, None)."""
    audio = sample.get(f"{key}_audio")
    if audio is None:
        val = sample.get(key)
        from fastvideo_tpu.eval.types import Video

        if isinstance(val, Video) and val.audio is not None:
            return val.audio, val.audio_sr
        return None, None
    return audio, sample.get(f"{key}_audio_sr") or _MEL_SR


@register("audio.clap_score")
class ClapScoreMetric(BaseMetric):
    """Text-audio cosine similarity via HF CLAP
    (reference clap_score/metric.py:29-120)."""

    requires_reference = False
    dependencies = ["transformers", "torch"]
    weights_env = "FASTVIDEO_CLAP_WEIGHTS"

    def __init__(self) -> None:
        self._model = None
        self._processor = None

    def setup(self) -> None:
        if self._model is not None:
            return
        import torch
        from transformers import ClapModel, ClapProcessor

        path = os.environ["FASTVIDEO_CLAP_WEIGHTS"]
        self._processor = ClapProcessor.from_pretrained(path)
        self._model = ClapModel.from_pretrained(
            path, torch_dtype=torch.float32).eval()

    @staticmethod
    def _projected(feats):
        return feats.pooler_output if hasattr(feats, "pooler_output") \
            else feats

    def compute(self, sample: dict) -> MetricResult:
        import torch

        audio, sr = _sample_audio(sample)
        text = sample.get("text_prompt")
        if audio is None:
            return self._skip("missing audio")
        if not text:
            return self._skip("missing text_prompt")
        self.setup()
        wav = peak_normalize(resample(to_mono(audio), int(sr), _CLAP_SR))
        with torch.no_grad():
            ai = self._processor(audio=wav, sampling_rate=_CLAP_SR,
                                 return_tensors="pt")
            a = self._projected(self._model.get_audio_features(**ai))
            ti = self._processor(text=[text], return_tensors="pt",
                                 padding=True)
            t = self._projected(self._model.get_text_features(**ti))
            score = torch.nn.functional.cosine_similarity(a, t).item()
        return MetricResult(name=self.name, score=float(score))


@register("audio.frechet_distance")
class FrechetAudioDistanceMetric(BaseMetric):
    """Corpus-vs-corpus FAD over audio embeddings (set metric)."""

    higher_is_better = False
    is_set_metric = True

    def __init__(self, extractor: str = "mel") -> None:
        if extractor not in ("mel", "clap"):
            raise ValueError(f"unknown FAD extractor {extractor!r}")
        self._extractor = extractor
        self._clap = None
        self._gen: list[np.ndarray] = []
        self._ref: list[np.ndarray] = []

    def reset(self) -> None:
        self._gen, self._ref = [], []

    def _embed(self, audio: np.ndarray, sr: int) -> np.ndarray:
        if self._extractor == "mel":
            return mel_stats_embedding(audio, sr)
        import torch

        if self._clap is None:
            self._clap = ClapScoreMetric()
            self._clap.setup()
        wav = peak_normalize(resample(to_mono(audio), sr, _CLAP_SR))
        with torch.no_grad():
            ai = self._clap._processor(audio=wav, sampling_rate=_CLAP_SR,
                                       return_tensors="pt")
            emb = self._clap._projected(
                self._clap._model.get_audio_features(**ai))
        return np.asarray(emb[0], np.float64)

    def accumulate(self, sample: dict) -> None:
        audio, sr = _sample_audio(sample)
        if audio is not None:
            buf = (self._ref if sample.get("role") == "reference"
                   else self._gen)
            buf.append(self._embed(audio, int(sr)))
        ref_audio, ref_sr = _sample_audio(sample, "reference")
        if ref_audio is not None:
            self._ref.append(self._embed(ref_audio, int(ref_sr)))

    def merge_from(self, other: "FrechetAudioDistanceMetric") -> None:
        self._gen.extend(other._gen)
        self._ref.extend(other._ref)

    def finalize(self) -> MetricResult:
        if len(self._gen) < 2 or len(self._ref) < 2:
            return self._skip("needs >=2 generated and >=2 reference clips")
        g = np.stack(self._gen)
        r = np.stack(self._ref)
        fad = frechet_distance(g.mean(0), np.cov(g, rowvar=False),
                               r.mean(0), np.cov(r, rowvar=False))
        return MetricResult(name=self.name, score=fad,
                            details={"extractor": self._extractor,
                                     "n_generated": len(self._gen),
                                     "n_reference": len(self._ref)})


@register("audio.kl_divergence")
class AudioKLMetric(BaseMetric):
    """Paired gen-vs-ref KL over softmaxed log-mel band energies."""

    higher_is_better = False

    def compute(self, sample: dict) -> MetricResult:
        audio, sr = _sample_audio(sample)
        ref, ref_sr = _sample_audio(sample, "reference")
        if audio is None or ref is None:
            return self._skip("needs generated and reference audio")

        def dist(a, s):
            a = peak_normalize(resample(to_mono(a), int(s), _MEL_SR))
            mel = log_mel_spectrogram(a, _MEL_SR).mean(axis=0)
            e = np.exp(mel - mel.max())
            return e / e.sum()

        p, q = dist(ref, ref_sr), dist(audio, sr)
        kl = float((p * np.log((p + 1e-12) / (q + 1e-12))).sum())
        return MetricResult(name=self.name, score=kl)


def word_error_rate(reference: str, hypothesis: str) -> float:
    """Levenshtein WER (substitutions + insertions + deletions) / N."""
    ref = reference.strip().lower().split()
    hyp = hypothesis.strip().lower().split()
    if not ref:
        return 0.0 if not hyp else 1.0
    d = np.zeros((len(ref) + 1, len(hyp) + 1), np.int32)
    d[:, 0] = np.arange(len(ref) + 1)
    d[0, :] = np.arange(len(hyp) + 1)
    for i in range(1, len(ref) + 1):
        for j in range(1, len(hyp) + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + cost)
    return float(d[-1, -1]) / len(ref)


@register("audio.wer")
class WERMetric(BaseMetric):
    """Word error rate of Whisper's transcript against
    sample['transcript'] (or text_prompt)."""

    requires_reference = False
    higher_is_better = False
    dependencies = ["transformers", "torch"]
    weights_env = "FASTVIDEO_ASR_WEIGHTS"

    def __init__(self) -> None:
        self._model = None
        self._processor = None

    def setup(self) -> None:
        if self._model is not None:
            return
        import torch
        from transformers import (WhisperForConditionalGeneration,
                                  WhisperProcessor)

        path = os.environ["FASTVIDEO_ASR_WEIGHTS"]
        self._processor = WhisperProcessor.from_pretrained(path)
        self._model = WhisperForConditionalGeneration.from_pretrained(
            path, torch_dtype=torch.float32).eval()

    def compute(self, sample: dict) -> MetricResult:
        import torch

        audio, sr = _sample_audio(sample)
        target = sample.get("transcript") or sample.get("text_prompt")
        if audio is None:
            return self._skip("missing audio")
        if not target:
            return self._skip("missing 'transcript'/'text_prompt'")
        self.setup()
        wav = resample(to_mono(audio), int(sr), 16000)
        inputs = self._processor(wav, sampling_rate=16000,
                                 return_tensors="pt")
        with torch.no_grad():
            ids = self._model.generate(inputs.input_features)
        text = self._processor.batch_decode(ids,
                                            skip_special_tokens=True)[0]
        return MetricResult(name=self.name,
                            score=word_error_rate(target, text),
                            details={"transcript": text})
