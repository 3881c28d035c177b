"""Class-based eval suite: registry/groups, Evaluator+pool+workers,
optical flow, vbench dims, audio metrics, physics_iq
(reference fastvideo/eval/)."""

import numpy as np
import pytest


def _video(seed=0, t=8, h=48, w=64, c=3):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.standard_normal((h, w, c)), (4, 4, 0))
    base = (base - base.min()) / (base.max() - base.min() + 1e-9)
    frames = [np.roll(base, shift=i, axis=1) for i in range(t)]
    return np.stack(frames).astype(np.float32)


def test_registry_groups_and_availability():
    from fastvideo_tpu.eval.registry import (list_metric_classes,
                                             missing_dependencies,
                                             resolve_group)

    names = list_metric_classes()
    for expected in ("common.psnr", "common.fvd",
                     "optical_flow.gt_optical_flow",
                     "vbench.temporal_flickering", "vbench.dynamic_degree",
                     "vbench.motion_smoothness", "audio.clap_score",
                     "audio.frechet_distance", "audio.wer",
                     "physics_iq.combined"):
        assert expected in names, expected
    assert resolve_group("vbench")
    assert resolve_group("nope") is None
    # weights-gated metric reports its gate when env unset
    assert any("FASTVIDEO_CLAP_WEIGHTS" in m
               for m in missing_dependencies("audio.clap_score"))
    assert missing_dependencies("common.psnr") == []


def test_evaluator_single_and_batch(tmp_path):
    from fastvideo_tpu.eval.evaluator import Evaluator

    vid = _video(0)
    ref = _video(0)
    ev = Evaluator(["common.psnr", "common.ssim",
                    "vbench.temporal_flickering"])
    res = ev.evaluate(video=vid, reference=ref)
    assert res["common.psnr"].score > 40  # identical videos
    assert 0 <= res["vbench.temporal_flickering"].score <= 1

    batch = ev.evaluate(samples=[
        {"video": _video(i), "reference": _video(0)} for i in range(3)
    ])
    assert len(batch) == 3
    assert batch[0]["common.psnr"].score > 40
    assert batch[1]["common.psnr"].score < batch[0]["common.psnr"].score


def _write_mp4(path, frames_u8, fps=8):
    import cv2

    h, w = frames_u8.shape[1:3]
    writer = cv2.VideoWriter(str(path),
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert writer.isOpened()
    for f in frames_u8:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()


def test_evaluator_pool_decodes_paths_and_set_metric(tmp_path):
    from fastvideo_tpu.eval.evaluator import Evaluator
    from fastvideo_tpu.eval.types import Video

    paths = []
    for i in range(4):
        arr = (_video(i, t=5, h=32, w=32) * 255).astype(np.uint8)
        p = tmp_path / f"v{i}.mp4"
        _write_mp4(p, arr)
        paths.append(str(p))

    ev = Evaluator(["common.mse", "common.fvd"], num_workers=2,
                   loader_threads=2)
    samples = [{"video": Video(source=p), "reference": Video(source=paths[0])}
               for p in paths]
    results = ev.evaluate(samples=samples)
    assert len(results) == 4
    assert all(r["common.mse"].score is not None for r in results)
    assert "common.fvd" in results.corpus
    assert np.isfinite(results.corpus["common.fvd"].score)

    # single-sample form refuses active set metrics
    with pytest.raises(ValueError, match="Set-vs-set"):
        ev.evaluate(video=_video(0), reference=_video(1))
    # metric filter restricts dispatch
    only = ev.evaluate(samples=samples[:2], metrics=["common.mse"])
    assert "common.fvd" not in only.corpus
    assert list(only[0]) == ["common.mse"]


def test_optical_flow_metric_discriminates():
    from fastvideo_tpu.eval.evaluator import Evaluator

    ref = _video(0, t=5)
    same = _video(0, t=5)
    rng = np.random.default_rng(1)
    different = np.clip(
        _video(0, t=5)[::-1] + 0.3 * rng.standard_normal(ref.shape), 0, 1
    ).astype(np.float32)

    ev = Evaluator(["optical_flow.gt_optical_flow"])
    good = ev.evaluate(video=same, reference=ref)
    bad = ev.evaluate(video=different, reference=ref)
    g = good["optical_flow.gt_optical_flow"]
    b = bad["optical_flow.gt_optical_flow"]
    assert g.score < b.score  # lower EPE = better match
    assert "mf_cosine_mean" in g.details
    assert g.details["n_frames"] == 4


def test_synthetic_optical_flow():
    from fastvideo_tpu.eval.evaluator import Evaluator

    vid = _video(0, t=4)  # rolls +1 px/frame in x
    ref_flow = np.zeros((*vid.shape[1:3], 2), np.float32)
    ref_flow[..., 0] = 1.0
    ev = Evaluator(["optical_flow.synthetic_optical_flow"])
    res = ev.evaluate(video=vid, reference_flow=ref_flow)
    m = res["optical_flow.synthetic_optical_flow"]
    assert m.score is not None
    assert m.details["mf_mag_ratio_mean"] == pytest.approx(1.0, abs=0.35)


def test_vbench_dynamic_degree_and_motion_smoothness():
    from fastvideo_tpu.eval.evaluator import Evaluator

    ev = Evaluator(["vbench.dynamic_degree", "vbench.motion_smoothness"])
    static = np.repeat(_video(0, t=1), 16, axis=0)
    moving = _video(0, t=16)
    rs = ev.evaluate(video=static, fps=8.0)
    rm = ev.evaluate(video=moving, fps=8.0)
    assert rs["vbench.dynamic_degree"].score == 0.0
    assert rs["vbench.motion_smoothness"].score > 0.99
    assert rm["vbench.motion_smoothness"].score > 0.8  # smooth roll
    # missing fps → explicit skip
    skipped = ev.evaluate(video=moving)
    assert skipped["vbench.dynamic_degree"].skipped


def test_audio_fad_and_kl(tmp_path):
    from fastvideo_tpu.eval.evaluator import Evaluator
    from fastvideo_tpu.eval.suite.audio import word_error_rate

    rng = np.random.default_rng(0)
    sr = 16000

    def tone(freq, seed):
        t = np.arange(sr) / sr
        return (np.sin(2 * np.pi * freq * t) +
                0.05 * rng.standard_normal(sr)).astype(np.float32)

    ev = Evaluator(["audio.frechet_distance", "audio.kl_divergence"])
    samples = []
    for i in range(3):
        samples.append({"video_audio": tone(440, i), "video_audio_sr": sr,
                        "reference_audio": tone(440, 10 + i),
                        "reference_audio_sr": sr})
    near = ev.evaluate(samples=samples)
    assert near.corpus["audio.frechet_distance"].score < 5.0
    assert near[0]["audio.kl_divergence"].score < 0.05

    far = ev.evaluate(samples=[
        {"video_audio": tone(3000, i), "video_audio_sr": sr,
         "reference_audio": tone(440, 10 + i), "reference_audio_sr": sr}
        for i in range(3)
    ])
    assert (far.corpus["audio.frechet_distance"].score >
            near.corpus["audio.frechet_distance"].score)
    assert (far[0]["audio.kl_divergence"].score >
            near[0]["audio.kl_divergence"].score)

    assert word_error_rate("the cat sat", "the cat sat") == 0.0
    assert word_error_rate("the cat sat", "the dog sat") == pytest.approx(
        1 / 3)


def test_wav_pool_decode(tmp_path):
    from scipy.io import wavfile

    from fastvideo_tpu.eval.evaluator import Evaluator
    from fastvideo_tpu.eval.types import Video

    sr = 16000
    t = np.arange(sr) / sr
    for i, f in enumerate((440, 880)):
        wav = (np.sin(2 * np.pi * f * t) * 32767 * 0.5).astype(np.int16)
        wavfile.write(str(tmp_path / f"a{i}.wav"), sr, wav)

    ev = Evaluator(["audio.kl_divergence"])
    res = ev.evaluate(
        video=Video(source=str(tmp_path / "a0.wav")),
        reference=Video(source=str(tmp_path / "a1.wav")))
    assert res["audio.kl_divergence"].score is not None
    assert res["audio.kl_divergence"].score > 0.01


def test_physics_iq():
    from fastvideo_tpu.eval.evaluator import Evaluator

    ev = Evaluator(["physics_iq.combined", "physics_iq.spatial_iou"])
    ref = _video(0, t=12, h=64, w=64)
    same = ev.evaluate(video=ref.copy(), reference=ref)
    c = same["physics_iq.combined"]
    # identical videos: near-perfect, but NOT exactly 1.0 — matching the
    # reference, generated masks take a lossy mp4 round-trip
    # (utils.py:151-171) that the reference-side masks do not
    assert 0.8 < c.score <= 1.0
    assert c.details["mse"] == pytest.approx(0.0, abs=1e-9)
    assert same["physics_iq.spatial_iou"].score > 0.8

    static = np.repeat(ref[:1], 12, axis=0)
    diff = ev.evaluate(video=static, reference=ref)
    assert diff["physics_iq.combined"].score < 0.5
    # with a second real take, the combined score uses the reference's
    # normalized 0-100 scale (physics_iq/metric.py:120-140)
    take2 = _video(0, t=12, h=64, w=64)
    norm = ev.evaluate(samples=[{
        "video": ref.copy(), "reference": ref, "reference_take2": take2,
    }])[0]["physics_iq.combined"]
    assert 0.0 <= norm.score <= 100.0 and norm.score > 50.0


def test_gated_metrics_skip_in_groups(monkeypatch):
    """Weights-gated metrics drop out of group selection but raise when
    named explicitly without skip_missing_deps."""
    from fastvideo_tpu.eval.evaluator import Evaluator

    monkeypatch.delenv("FASTVIDEO_CLAP_WEIGHTS", raising=False)
    ev = Evaluator(["audio"])  # group: gated members silently skipped
    assert "audio.clap_score" not in ev.metric_names
    assert "audio.frechet_distance" in ev.metric_names
    with pytest.raises(ImportError):
        Evaluator(["audio.clap_score"])
    ev2 = Evaluator(["audio.clap_score"], skip_missing_deps=True)
    assert ev2.metric_names == []


def test_eval_cli_run(tmp_path, capsys):
    from fastvideo_tpu.entrypoints.cli.main import main

    arr = (_video(0, t=5, h=32, w=32) * 255).astype(np.uint8)
    vp = tmp_path / "gen.mp4"
    _write_mp4(vp, arr)
    out = tmp_path / "res.json"
    rc = main(["eval", "run", "--videos", str(vp), "--reference", str(vp),
               "--metrics", "psnr,vbench.temporal_flickering", "--fps", "8",
               "--output", str(out)])
    assert rc == 0
    import json

    payload = json.loads(out.read_text())
    scores = payload["videos"][0]["scores"]
    assert scores["common.psnr"] > 40
    assert 0 <= scores["vbench.temporal_flickering"] <= 1

    rc = main(["eval", "list"])
    assert rc == 0
    listed = capsys.readouterr().out
    assert "optical_flow.gt_optical_flow" in listed
    assert "unavailable" in listed  # gated metrics annotated
