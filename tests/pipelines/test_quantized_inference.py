"""End-to-end: int8-quantized transformer serving path.

TPU analog of the reference's FastWan-QAD quantized deployment (README.md:12
1.8 s FP8 headline; fastvideo_args.py:242 ``transformer_quant``): the DiT's
linears are swapped for W8A8 int8 at load, driven by
``FastVideoArgs.transformer_quant`` / ``EngineConfig.quantization`` /
``FASTVIDEO_TRANSFORMER_QUANT``.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("fastwan_tiny_q")
    return make_tiny_wan_checkpoint(
        str(root / "FastWan2.1-T2V-tiny-Diffusers"))


def _dit_int8_count(gen):
    from fastvideo_tpu.layers.quantization import Int8Linear

    dit = gen.executor.pipeline.get_module("transformer")

    count = 0
    stack = [dit]
    seen = set()
    while stack:
        mod = stack.pop()
        if id(mod) in seen:
            continue
        seen.add(id(mod))
        for child in vars(mod).values():
            if isinstance(child, Int8Linear):
                count += 1
            elif isinstance(child, (list, tuple)):
                stack.extend(c for c in child if hasattr(c, "__dict__"))
            elif hasattr(child, "__dict__") and not isinstance(
                    child, (str, bytes)):
                stack.append(child)
    return count


def test_int8_generate_matches_bf16(ckpt, tmp_path, monkeypatch):
    """Quantized pipeline generates; output stays close to the bf16 path."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    ref = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    base = ref.generate_video(prompt="w1 w2 w3", height=32, width=32,
                              num_frames=5, seed=3, save_video=False)
    f_base = base["frames"][0].astype(np.int32)
    par.destroy_mesh()

    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1,
                                         transformer_quant="int8")
    assert gen.fastvideo_args.transformer_quant == "int8"
    assert _dit_int8_count(gen) > 0
    result = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                                num_frames=5, seed=3, save_video=False)
    frames = result["frames"][0]
    assert frames.shape == (5, 32, 32, 3)
    assert frames.dtype == np.uint8
    # per-token dynamic W8A8 on a 3-step DMD rollout: uint8 frames should
    # track the bf16 path closely on a tiny model
    err = np.abs(frames.astype(np.int32) - f_base).mean()
    assert err < 16.0, f"int8 path diverged from bf16: mean|d|={err}"
    # pinned SSIM bar vs the bf16 output (the accuracy gate behind the
    # quantized serving headline; reference gates its QAD checkpoints on
    # output quality the same way)
    from fastvideo_tpu.eval.metrics import ssim

    s = ssim(frames.astype(np.float32) / 255.0,
             f_base.astype(np.float32) / 255.0)
    assert s >= 0.95, f"int8 SSIM vs bf16 below bar: {s:.4f}"
    # determinism of the quantized path
    r2 = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                            num_frames=5, seed=3, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])
    par.destroy_mesh()


def test_int8_in_place_quantize_matches_load_path(ckpt):
    """bench.py quantizes the RESIDENT DiT in place (skipping a ~15-min
    tunnel reload); this pins that sequence — quantize_model_linears on the
    live pipeline module + dropping the denoising stage's compiled step —
    to the exact output of the from_pretrained(transformer_quant=...) load
    path."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator
    from fastvideo_tpu.layers.quantization import (QuantizationConfig,
                                                   quantize_model_linears)

    kwargs = dict(prompt="w1 w2 w3", height=32, width=32, num_frames=5,
                  seed=3, save_video=False)

    par.destroy_mesh()
    loaded = VideoGenerator.from_pretrained(ckpt, num_gpus=1,
                                            transformer_quant="int8")
    f_loaded = loaded.generate_video(**kwargs)["frames"][0]
    par.destroy_mesh()

    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    gen.generate_video(**kwargs)  # compile + run the bf16 graph first
    pipe = gen.executor.pipeline
    n = quantize_model_linears(pipe.get_module("transformer"),
                               QuantizationConfig())
    assert n > 0
    for stage in getattr(pipe, "stages", []):
        if hasattr(stage, "_step_fns"):
            stage._step_fns.clear()
    f_inplace = gen.generate_video(**kwargs)["frames"][0]
    np.testing.assert_array_equal(f_inplace, f_loaded)
    par.destroy_mesh()


def test_int8_weight_only_and_env(ckpt, monkeypatch):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    monkeypatch.setenv("FASTVIDEO_TRANSFORMER_QUANT", "int8-weight-only")
    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    assert _dit_int8_count(gen) > 0
    result = gen.generate_video(prompt="w1", height=32, width=32,
                                num_frames=5, seed=5, save_video=False)
    assert result["frames"][0].shape == (5, 32, 32, 3)
    par.destroy_mesh()


def test_from_config_quantization_plumbs(ckpt):
    """EngineConfig.quantization.transformer_quant reaches FastVideoArgs."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator
    from fastvideo_tpu.api import (EngineConfig, GeneratorConfig,
                                   QuantizationConfig)

    par.destroy_mesh()
    cfg = GeneratorConfig(
        model_path=ckpt,
        engine=EngineConfig(quantization=QuantizationConfig(
            transformer_quant="int8")))
    gen = VideoGenerator.from_config(cfg)
    assert gen.fastvideo_args.transformer_quant == "int8"
    assert _dit_int8_count(gen) > 0
    par.destroy_mesh()


def test_resolve_quant_method_rejects_unknown():
    from fastvideo_tpu.layers.quantization.int8 import resolve_quant_method

    assert resolve_quant_method("INT8") == "int8_w8a8"
    assert resolve_quant_method("int8-weight-only") == "int8_weight_only"
    with pytest.raises(ValueError):
        resolve_quant_method("fp4")


def test_text_encoder_quant_at_load(ckpt):
    """int8 weight-only text encoder, quantized on the HOST at load (the
    UMT5-XXL fit path; analog of the reference's per-encoder
    text_encoder_precisions, e.g. fp8 -- configs/pipelines/base.py:70): Int8Linears replace the encoder's Linears before any weight
    lands, and the output tracks the bf16 encoder closely."""
    import fastvideo_tpu.parallel as par
    from flax import nnx

    from fastvideo_tpu import VideoGenerator
    from fastvideo_tpu.layers.quantization import Int8Linear

    kw = dict(prompt="w1 w2", height=32, width=32, num_frames=5,
              num_inference_steps=2, guidance_scale=1.0, seed=3,
              save_video=False)
    par.destroy_mesh()
    base = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    a = base.generate_video(**kw)["frames"][0].astype(np.int32)
    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(
        ckpt, num_gpus=1, text_encoder_quant="int8-weight-only")
    enc = gen.executor.pipeline.get_module("text_encoder")
    n8 = sum(1 for _, v in nnx.iter_graph(enc) if isinstance(v, Int8Linear))
    assert n8 > 0, "no encoder linears were quantized at load"
    b = gen.generate_video(**kw)["frames"][0].astype(np.int32)
    par.destroy_mesh()
    d = np.abs(a - b)
    assert d.mean() < 8.0, f"quantized-encoder output diverged: {d.mean()}"
