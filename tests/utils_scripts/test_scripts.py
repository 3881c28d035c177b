"""Ops scripts: LoRA extract/merge round-trip, wan->diffusers key table,
pt->safetensors conversion (reference scripts/{lora_extraction,
checkpoint_conversion})."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "scripts", "lora_extraction"))
sys.path.insert(0, os.path.join(REPO, "scripts", "checkpoint_conversion"))


def test_lora_extract_merge_roundtrip():
    from extract_lora import extract_lora, reconstruction_error
    from merge_lora import merge_lora

    rng = np.random.default_rng(0)
    base = {"blocks.0.attn.to_q.weight":
            rng.standard_normal((32, 32)).astype(np.float32),
            "blocks.0.norm.weight":
            rng.standard_normal(32).astype(np.float32)}
    # fine-tune = base + a true rank-4 delta
    u = rng.standard_normal((32, 4)).astype(np.float32)
    vt = rng.standard_normal((4, 32)).astype(np.float32)
    ft = {"blocks.0.attn.to_q.weight":
          base["blocks.0.attn.to_q.weight"] + 0.1 * (u @ vt),
          "blocks.0.norm.weight": base["blocks.0.norm.weight"]}

    adapter, skipped = extract_lora(base, ft, rank=4)
    assert not skipped
    assert set(adapter) == {"blocks.0.attn.to_q.weight.lora_A",
                            "blocks.0.attn.to_q.weight.lora_B"}
    a = adapter["blocks.0.attn.to_q.weight.lora_A"]
    b = adapter["blocks.0.attn.to_q.weight.lora_B"]
    assert a.shape == (4, 32) and b.shape == (32, 4)
    # rank-4 delta is recovered exactly (up to SVD fp error)
    err = reconstruction_error(base["blocks.0.attn.to_q.weight"],
                               ft["blocks.0.attn.to_q.weight"], a, b)
    assert err < 1e-5

    merged = merge_lora(base, adapter)
    np.testing.assert_allclose(merged["blocks.0.attn.to_q.weight"],
                               ft["blocks.0.attn.to_q.weight"], atol=1e-5)


def test_lora_rank_truncation():
    from extract_lora import extract_lora

    rng = np.random.default_rng(1)
    base = {"w": rng.standard_normal((16, 16)).astype(np.float32)}
    ft = {"w": base["w"] + rng.standard_normal((16, 16)).astype(np.float32)}
    adapter, _ = extract_lora(base, ft, rank=2)
    assert adapter["w.lora_A"].shape == (2, 16)
    assert adapter["w.lora_B"].shape == (16, 2)


def test_wan_to_diffusers_keys():
    from wan_to_diffusers import convert_key

    assert convert_key("blocks.3.self_attn.q.weight") == \
        "blocks.3.attn1.to_q.weight"
    assert convert_key("blocks.12.cross_attn.o.bias") == \
        "blocks.12.attn2.to_out.0.bias"
    assert convert_key("text_embedding.0.weight") == \
        "condition_embedder.text_embedder.linear_1.weight"
    assert convert_key("head.modulation") == "scale_shift_table"
    assert convert_key("blocks.4.ffn.0.weight") == \
        "blocks.4.ffn.net.0.proj.weight"
    # unknown keys pass through
    assert convert_key("patch_embedding.weight") == "patch_embedding.weight"


def test_pt_to_safetensors(tmp_path):
    torch = pytest.importorskip("torch")
    from pt_to_safetensors import convert
    from safetensors.numpy import load_file

    sd = {"a.weight": torch.randn(4, 4), "b.bias": torch.randn(4)}
    src = str(tmp_path / "ckpt.pt")
    dst = str(tmp_path / "ckpt.safetensors")
    torch.save({"state_dict": sd, "step": 10}, src)
    n = convert(src, dst)
    assert n == 2
    out = load_file(dst)
    np.testing.assert_allclose(out["a.weight"], sd["a.weight"].numpy())
