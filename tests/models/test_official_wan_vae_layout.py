"""Official (non-diffusers) Wan VAE key layout loads into
AutoencoderKLWan (LingBot-World 2 / original Wan release; reference
vaes/lingbotworld2_wanvae.py:266-470)."""

import re

import numpy as np


def _to_official(name: str, num_res_blocks: int, num_stages: int) -> str:
    """Inverse of official_wan_vae_mapping for test fixtures."""
    leafs = {"norm1": ("residual.0", ("gamma", "bias")),
             "conv1": ("residual.2", ("weight", "bias")),
             "norm2": ("residual.3", ("gamma", "bias")),
             "conv2": ("residual.6", ("weight", "bias")),
             "conv_shortcut": ("shortcut", ("weight", "bias"))}

    def rb(name, prefix_ours, prefix_off):
        for ours, (off, _) in leafs.items():
            m = re.match(rf"^{prefix_ours}\.{ours}\.(\w+)$", name)
            if m:
                return f"{prefix_off}.{off}.{m.group(1)}"
        return None

    m = re.match(r"^encoder\.down_blocks\.(\d+)\.(.*)$", name)
    if m:
        i, rest = m.group(1), m.group(2)
        out = rb(name, rf"encoder\.down_blocks\.{i}",
                 f"encoder.downsamples.{i}")
        if out:
            return out
        if rest.startswith("resample_conv."):
            return f"encoder.downsamples.{i}.resample.1." + \
                rest.split(".", 1)[1]
        if rest.startswith("time_conv."):
            return f"encoder.downsamples.{i}.{rest}"
    m = re.match(r"^decoder\.up_blocks\.(\d+)\.(.*)$", name)
    if m:
        stage, rest = int(m.group(1)), m.group(2)
        base = stage * (num_res_blocks + 2)
        m2 = re.match(r"^resnets\.(\d+)\.", rest)
        if m2:
            flat = base + int(m2.group(1))
            out = rb(name,
                     rf"decoder\.up_blocks\.{stage}\.resnets\.{m2.group(1)}",
                     f"decoder.upsamples.{flat}")
            if out:
                return out
        if rest.startswith("upsamplers.0.resample_conv."):
            return (f"decoder.upsamples.{base + num_res_blocks + 1}"
                    ".resample.1." + rest.rsplit(".", 1)[1])
        if rest.startswith("upsamplers.0.time_conv."):
            return (f"decoder.upsamples.{base + num_res_blocks + 1}"
                    ".time_conv." + rest.rsplit(".", 1)[1])
    for coder in ("encoder", "decoder"):
        for idx, ours in (("0", "resnets.0"), ("2", "resnets.1")):
            out = rb(name, rf"{coder}\.mid_block\.{ours.replace('.', r'.')}"
                     .replace("resnets.", r"resnets\."),
                     f"{coder}.middle.{idx}")
            if out:
                return out
        m = re.match(rf"^{coder}\.mid_block\.attentions\.0\.(.*)$", name)
        if m:
            return f"{coder}.middle.1.{m.group(1)}"
        m = re.match(rf"^{coder}\.norm_out\.(\w+)$", name)
        if m:
            return f"{coder}.head.0.{m.group(1)}"
        m = re.match(rf"^{coder}\.conv_out\.(.*)$", name)
        if m:
            return f"{coder}.head.2.{m.group(1)}"
        m = re.match(rf"^{coder}\.conv_in\.(.*)$", name)
        if m:
            return f"{coder}.conv1.{m.group(1)}"
    m = re.match(r"^quant_conv\.(.*)$", name)
    if m:
        return f"conv1.{m.group(1)}"
    m = re.match(r"^post_quant_conv\.(.*)$", name)
    if m:
        return f"conv2.{m.group(1)}"
    return name


def test_official_layout_roundtrip(tmp_path):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.vaes.wan import (
        WanVAEArchConfig, official_wan_vae_mapping)
    from fastvideo_tpu.models.loader.export import (export_torch_layout,
                                                    save_safetensors)
    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    arch = WanVAEArchConfig(base_dim=8, z_dim=4, dim_mult=(1, 2),
                            num_res_blocks=1, attn_scales=(),
                            temperal_downsample=(True,),
                            latents_mean=(0.0,) * 4,
                            latents_std=(1.0,) * 4,
                            scale_factor_temporal=2, scale_factor_spatial=2)
    src = AutoencoderKLWan(arch, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = export_torch_layout(src)
    official = {
        "model." + _to_official(k, num_res_blocks=1, num_stages=2): v
        for k, v in sd.items()
    }
    # every key must actually change shape into the official namespace
    assert any(".downsamples." in k for k in official)
    assert any(".upsamples." in k for k in official)
    assert any(".middle.1." in k for k in official)
    assert not any(".down_blocks." in k for k in official)
    assert not any(".up_blocks." in k for k in official)
    path = str(tmp_path / "official.safetensors")
    save_safetensors(path, official)

    dst = AutoencoderKLWan(arch, param_dtype=jnp.float32, rngs=nnx.Rngs(7))
    mapping = official_wan_vae_mapping(num_res_blocks=1, num_stages=2)
    from safetensors import safe_open

    def it():
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                yield k, f.get_tensor(k)

    n = load_weights(dst, it(), mapping, dtype=jnp.float32)
    assert n == len(official)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 3, 5, 16, 16)), jnp.float32)
    a = np.asarray(src.encode(x).mean)
    b = np.asarray(dst.encode(x).mean)
    np.testing.assert_allclose(a, b, atol=1e-6)
    z = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)), jnp.float32)
    np.testing.assert_allclose(np.asarray(src.decode(z)),
                               np.asarray(dst.decode(z)), atol=1e-6)


def test_registry_aliases():
    from fastvideo_tpu.models.registry import resolve_model_cls
    from fastvideo_tpu.models.vaes.hunyuan import AutoencoderKLHunyuanVideo
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    assert resolve_model_cls("AutoencoderKLCausal3D")[0] is \
        AutoencoderKLHunyuanVideo
    assert resolve_model_cls("LingBotWorld2WanVAE")[0] is AutoencoderKLWan
