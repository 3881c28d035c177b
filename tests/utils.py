"""Test fixtures: tiny random-weight diffusers-format checkpoints.

Mirrors the reference test strategy of tiny-config random-weight models
(/root/reference/fastvideo/tests/distributed/test_sp_wan.py:26-50,
tests/train/fixtures/*_min.yaml).
"""

from __future__ import annotations

import json
import os

import numpy as np

TINY_DIT = dict(num_attention_heads=4, attention_head_dim=16, in_channels=4,
                out_channels=4, text_dim=32, freq_dim=32, ffn_dim=64,
                num_layers=2, patch_size=[1, 2, 2], qk_norm="rms_norm_across_heads",
                cross_attn_norm=True, eps=1e-6)
TINY_VAE = dict(base_dim=8, z_dim=4, dim_mult=[1, 2], num_res_blocks=1,
                attn_scales=[], temperal_downsample=[True],
                latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
                scale_factor_temporal=2, scale_factor_spatial=2)
TINY_T5 = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=48, num_layers=2,
               num_heads=4, relative_attention_num_buckets=8,
               relative_attention_max_distance=16,
               feed_forward_proj="gated-gelu", model_type="umt5")


from fastvideo_tpu.models.loader.export import (  # noqa: E402
    export_torch_layout as _export_torch_layout,
    make_word_level_tokenizer as _make_tokenizer,
    save_safetensors as _save_safetensors)


def make_tiny_lucy_edit_checkpoint(root: str, seed: int = 0) -> str:
    """Lucy Edit layout: in_channels = 2 * z_dim ([noise | video])."""
    return _make_tiny_wan_v2v_variant(root, seed, "LucyEditPipeline",
                                      in_mult=2)


def make_tiny_wan_v2v_checkpoint(root: str, seed: int = 0) -> str:
    """Wan V2V layout: in_channels = 3 * z_dim ([noise|video|zeros])."""
    return _make_tiny_wan_v2v_variant(root, seed, "WanVideoToVideoPipeline",
                                      in_mult=3)


def _make_tiny_wan_v2v_variant(root: str, seed: int, class_name: str,
                               in_mult: int) -> str:
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    make_tiny_wan_checkpoint(root, seed)
    with open(os.path.join(root, "model_index.json")) as fh:
        index = json.load(fh)
    index["_class_name"] = class_name
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump(index, fh)

    tdir = os.path.join(root, "transformer")
    dit_cfg = dict(TINY_DIT)
    dit_cfg["in_channels"] = TINY_VAE["z_dim"] * in_mult
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "WanTransformer3DModel", **dit_cfg}, fh)
    arch = WanArchConfig(**{k: tuple(v) if isinstance(v, list) else v
                            for k, v in dit_cfg.items()})
    dit = WanTransformer3DModel(arch, param_dtype=jnp.float32,
                                rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))
    return root


def make_tiny_wan_checkpoint(root: str, seed: int = 0,
                             causal: bool = False) -> str:
    """Write a tiny random-weight Wan T2V checkpoint (diffusers layout).

    With ``causal=True`` the transformer is a CausalWanTransformer3DModel
    (block-autoregressive student for dfsft/tfsft/self-forcing)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.models.dits.causal_wan import (
        CausalWanTransformer3DModel)
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "WanPipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "UniPCMultistepScheduler"],
            "text_encoder": ["transformers", "UMT5EncoderModel"],
            "tokenizer": ["transformers", "T5TokenizerFast"],
            "transformer": ["diffusers", "WanTransformer3DModel"],
            "vae": ["diffusers", "AutoencoderKLWan"],
        }, fh)

    # transformer
    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    dit_cfg = {k: v for k, v in TINY_DIT.items()}
    dit_cls = WanTransformer3DModel
    if causal:
        dit_cfg.update(num_frames_per_block=2, local_attn_size=-1,
                       sink_size=0)
        dit_cls = CausalWanTransformer3DModel
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": dit_cls.__name__, **dit_cfg}, fh)
    arch = WanArchConfig(**{
        **{k: tuple(v) if isinstance(v, list) else v
           for k, v in dit_cfg.items()}
    })
    dit = dit_cls(arch, param_dtype=jnp.float32, rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    # vae
    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLWan", **TINY_VAE}, fh)
    varch = WanVAEArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_VAE.items()
    })
    vae = AutoencoderKLWan(varch, param_dtype=jnp.float32,
                           rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    # text encoder
    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["UMT5EncoderModel"], **TINY_T5}, fh)
    earch_kwargs = {k: v for k, v in TINY_T5.items() if k != "model_type"}
    earch = T5ArchConfig(**earch_kwargs, is_umt5=True)
    enc = T5EncoderModel(earch, param_dtype=jnp.float32,
                         rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(enc))

    # tokenizer + scheduler
    _make_tokenizer(os.path.join(root, "tokenizer"),
                    TINY_T5["vocab_size"])
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "UniPCMultistepScheduler",
            "num_train_timesteps": 1000,
            "solver_order": 2,
        }, fh)
    return root


TINY_LONGCAT_DIT = dict(hidden_size=32, depth=2, num_attention_heads=2,
                        attention_head_dim=16, in_channels=4, out_channels=4,
                        patch_size=[1, 2, 2], mlp_ratio=2,
                        adaln_tembed_dim=16, caption_channels=32,
                        frequency_embedding_size=16)


def make_tiny_longcat_checkpoint(root: str, seed: int = 0,
                                 i2v: bool = False) -> str:
    """Tiny random-weight LongCat-Video checkpoint (diffusers layout):
    UMT5 text encoder + Wan VAE + LongCat DiT."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.longcat import LongCatArchConfig
    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.models.dits.longcat import LongCatTransformer3DModel
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": ("LongCatImageToVideoPipeline"
                            if i2v else "LongCatPipeline"),
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "UMT5EncoderModel"],
            "tokenizer": ["transformers", "T5TokenizerFast"],
            "transformer": ["diffusers", "LongCatTransformer3DModel"],
            "vae": ["diffusers", "AutoencoderKLWan"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "LongCatTransformer3DModel",
                   **TINY_LONGCAT_DIT}, fh)
    arch = LongCatArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_LONGCAT_DIT.items()
    })
    dit = LongCatTransformer3DModel(arch, param_dtype=jnp.float32,
                                    rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLWan", **TINY_VAE}, fh)
    varch = WanVAEArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_VAE.items()
    })
    vae = AutoencoderKLWan(varch, param_dtype=jnp.float32,
                           rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["UMT5EncoderModel"], **TINY_T5}, fh)
    earch_kwargs = {k: v for k, v in TINY_T5.items() if k != "model_type"}
    earch = T5ArchConfig(**earch_kwargs, is_umt5=True)
    enc = T5EncoderModel(earch, param_dtype=jnp.float32,
                         rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(enc))

    _make_tokenizer(os.path.join(root, "tokenizer"), TINY_T5["vocab_size"])
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
            "shift": 1.0,
        }, fh)
    return root


TINY_CLIP = dict(hidden_size=32, intermediate_size=48, num_hidden_layers=1,
                 num_attention_heads=2, image_size=28, patch_size=14,
                 num_channels=3, hidden_act="quick_gelu")


def make_tiny_wan_i2v_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny Wan I2V checkpoint: adds image_encoder + I2V DiT channels."""
    import json as _json

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.clip import CLIPVisionArchConfig
    from fastvideo_tpu.models.encoders.clip import CLIPVisionModel

    make_tiny_wan_checkpoint(root, seed)
    # I2V: in = z(4) + mask(tr=2) + cond(4) = 10; image_dim = CLIP hidden
    tdir = os.path.join(root, "transformer")
    cfg = _json.load(open(os.path.join(tdir, "config.json")))
    cfg.update(in_channels=10, image_dim=TINY_CLIP["hidden_size"],
               added_kv_proj_dim=TINY_DIT["num_attention_heads"] *
               TINY_DIT["attention_head_dim"])
    _json.dump(cfg, open(os.path.join(tdir, "config.json"), "w"))
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    arch_kwargs = {k: tuple(v) if isinstance(v, list) else v
                   for k, v in cfg.items() if k != "_class_name"}
    arch = WanArchConfig(**arch_kwargs)
    dit = WanTransformer3DModel(arch, param_dtype=jnp.float32,
                                rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    # image encoder
    idir = os.path.join(root, "image_encoder")
    os.makedirs(idir, exist_ok=True)
    _json.dump({"architectures": ["CLIPVisionModelWithProjection"],
                **TINY_CLIP}, open(os.path.join(idir, "config.json"), "w"))
    clip = CLIPVisionModel(CLIPVisionArchConfig(**TINY_CLIP),
                           param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 5))
    _save_safetensors(os.path.join(idir, "model.safetensors"),
                      _export_torch_layout(clip))

    index = _json.load(open(os.path.join(root, "model_index.json")))
    index["_class_name"] = "WanImageToVideoPipeline"
    index["image_encoder"] = ["transformers", "CLIPVisionModelWithProjection"]
    _json.dump(index, open(os.path.join(root, "model_index.json"), "w"))
    return root


def make_tiny_lingbotworld_checkpoint(root: str, seed: int = 0) -> str:
    """LingBot-World tiny: Wan I2V + camera-FiLM transformer. Plücker
    channels follow the tiny VAE fold (6 * spatial_ratio^2 = 24)."""
    import json as _json

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.lingbotworld import (
        LingBotWorldArchConfig, LingBotWorldTransformer3DModel)

    make_tiny_wan_i2v_checkpoint(root, seed)
    tdir = os.path.join(root, "transformer")
    cfg = _json.load(open(os.path.join(tdir, "config.json")))
    cfg["_class_name"] = "LingBotWorldTransformer3DModel"
    cfg["cam_in_channels"] = 6 * TINY_VAE["scale_factor_spatial"]**2
    _json.dump(cfg, open(os.path.join(tdir, "config.json"), "w"))
    arch_kwargs = {k: tuple(v) if isinstance(v, list) else v
                   for k, v in cfg.items() if k != "_class_name"}
    dit = LingBotWorldTransformer3DModel(
        LingBotWorldArchConfig(**arch_kwargs), param_dtype=jnp.float32,
        rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    index = _json.load(open(os.path.join(root, "model_index.json")))
    index["_class_name"] = "LingBotWorldImageToVideoPipeline"
    _json.dump(index, open(os.path.join(root, "model_index.json"), "w"))
    return root


def make_tiny_lingbotworld2_checkpoint(root: str, seed: int = 0) -> str:
    """LingBot-World 2 causal-fast tiny: streaming chunks + camera."""
    import json as _json

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.lingbotworld2 import (
        LingBotWorld2CausalFastArchConfig,
        LingBotWorld2CausalFastTransformer3DModel)

    make_tiny_wan_checkpoint(root, seed)
    tdir = os.path.join(root, "transformer")
    cfg = _json.load(open(os.path.join(tdir, "config.json")))
    cfg.update(_class_name="LingBotWorld2CausalFastTransformer3DModel",
               in_channels=10, out_channels=4,
               cam_in_channels=6 * TINY_VAE["scale_factor_spatial"]**2,
               local_attn_size=4, sink_size=1, chunk_size=2,
               timesteps_index=[0, 500])
    _json.dump(cfg, open(os.path.join(tdir, "config.json"), "w"))
    arch_kwargs = {k: tuple(v) if isinstance(v, list) else v
                   for k, v in cfg.items() if k != "_class_name"}
    dit = LingBotWorld2CausalFastTransformer3DModel(
        LingBotWorld2CausalFastArchConfig(**arch_kwargs),
        param_dtype=jnp.float32, rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    index = _json.load(open(os.path.join(root, "model_index.json")))
    index["_class_name"] = "LingBotWorld2CausalFastPipeline"
    _json.dump(index, open(os.path.join(root, "model_index.json"), "w"))
    return root


TINY_HY_DIT = dict(num_attention_heads=2, attention_head_dim=8,
                   in_channels=4, out_channels=4, num_layers=1,
                   num_single_layers=1, num_refiner_layers=1,
                   patch_size=2, patch_size_t=1, rope_axes_dim=[4, 2, 2],
                   text_embed_dim=32, pooled_projection_dim=16,
                   rope_theta=256.0, guidance_embeds=True, qk_norm="rms_norm")
TINY_HY_VAE = dict(latent_channels=4, block_out_channels=[8, 16, 16, 16],
                   layers_per_block=1, norm_num_groups=4,
                   scaling_factor=0.476986)
TINY_LLAMA = dict(vocab_size=128, hidden_size=32, intermediate_size=48,
                  num_hidden_layers=2, num_attention_heads=2,
                  num_key_value_heads=1, max_position_embeddings=512)
TINY_CLIP_TEXT = dict(vocab_size=128, hidden_size=16, intermediate_size=32,
                      num_hidden_layers=1, num_attention_heads=2,
                      max_position_embeddings=77, eos_token_id=1)


def make_tiny_hunyuan_checkpoint(root: str, seed: int = 0,
                                 gamecraft: bool = False) -> str:
    """Tiny random-weight HunyuanVideo checkpoint (diffusers layout).

    ``gamecraft=True`` swaps the DiT for HunyuanGameCraft (9 = 4 latent
    + 4 gt + 1 mask input channels, CameraNet, no embedded guidance).
    """
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.hunyuan import (
        HunyuanVideoArchConfig)
    from fastvideo_tpu.models.dits.hunyuan import (
        HunyuanVideoTransformer3DModel)
    from fastvideo_tpu.models.encoders.clip import (CLIPTextArchConfig,
                                                    CLIPTextModel)
    from fastvideo_tpu.models.encoders.llama import (LlamaArchConfig,
                                                     LlamaEncoderModel)
    from fastvideo_tpu.models.vaes.hunyuan import (AutoencoderKLHunyuanVideo,
                                                   HunyuanVAEArchConfig)

    dit_class = ("HunyuanGameCraftTransformer3DModel" if gamecraft
                 else "HunyuanVideoTransformer3DModel")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": ("HunyuanGameCraftPipeline" if gamecraft
                            else "HunyuanVideoPipeline"),
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "LlamaModel"],
            "text_encoder_2": ["transformers", "CLIPTextModel"],
            "tokenizer": ["transformers", "PreTrainedTokenizerFast"],
            "tokenizer_2": ["transformers", "PreTrainedTokenizerFast"],
            "transformer": ["diffusers", dit_class],
            "vae": ["diffusers", "AutoencoderKLHunyuanVideo"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    dit_kwargs = dict(TINY_HY_DIT)
    if gamecraft:
        dit_kwargs.update(in_channels=9, out_channels=4,
                          guidance_embeds=False, camera_in_channels=6,
                          camera_downscale_coef=8)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": dit_class, **dit_kwargs}, fh)
    if gamecraft:
        from fastvideo_tpu.configs.models.dits.hunyuangamecraft import (
            HunyuanGameCraftArchConfig)
        from fastvideo_tpu.models.dits.hunyuangamecraft import (
            HunyuanGameCraftTransformer3DModel)

        arch = HunyuanGameCraftArchConfig(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in dit_kwargs.items()
        })
        dit = HunyuanGameCraftTransformer3DModel(
            arch, param_dtype=jnp.float32, rngs=nnx.Rngs(seed))
        # the reference zero-inits camera_net.final_proj (conditioning off
        # at init); randomize it so tiny-checkpoint tests exercise a LIVE
        # camera signal.
        import jax as _jax

        dit.camera_net.final_proj.kernel.value = 0.2 * _jax.random.normal(
            _jax.random.PRNGKey(seed + 99),
            dit.camera_net.final_proj.kernel.value.shape, jnp.float32)
    else:
        arch = HunyuanVideoArchConfig(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in dit_kwargs.items()
        })
        dit = HunyuanVideoTransformer3DModel(arch, param_dtype=jnp.float32,
                                             rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLHunyuanVideo",
                   **TINY_HY_VAE}, fh)
    varch = HunyuanVAEArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_HY_VAE.items()
    })
    vae = AutoencoderKLHunyuanVideo(varch, param_dtype=jnp.float32,
                                    rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["LlamaModel"], **TINY_LLAMA}, fh)
    llama = LlamaEncoderModel(LlamaArchConfig(**TINY_LLAMA),
                              param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(llama))

    e2dir = os.path.join(root, "text_encoder_2")
    os.makedirs(e2dir, exist_ok=True)
    with open(os.path.join(e2dir, "config.json"), "w") as fh:
        json.dump({"architectures": ["CLIPTextModel"], **TINY_CLIP_TEXT}, fh)
    clip = CLIPTextModel(CLIPTextArchConfig(**TINY_CLIP_TEXT),
                         param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 3))
    _save_safetensors(os.path.join(e2dir, "model.safetensors"),
                      _export_torch_layout(clip))

    _make_tokenizer(os.path.join(root, "tokenizer"),
                    TINY_LLAMA["vocab_size"])
    _make_tokenizer(os.path.join(root, "tokenizer_2"),
                    TINY_CLIP_TEXT["vocab_size"])
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
            "shift": 7.0,
        }, fh)
    return root


TINY_SD3_DIT = dict(sample_size=16, patch_size=2, in_channels=4,
                    out_channels=4, num_layers=2, attention_head_dim=8,
                    num_attention_heads=2, joint_attention_dim=32,
                    caption_projection_dim=16, pooled_projection_dim=16,
                    pos_embed_max_size=16, qk_norm="rms_norm",
                    dual_attention_layers=[0])
TINY_KL_VAE = dict(latent_channels=4, block_out_channels=[8, 16, 16],
                   layers_per_block=1, norm_num_groups=4,
                   scaling_factor=1.5, shift_factor=0.06)
TINY_CLIP_PROJ = dict(vocab_size=128, hidden_size=16, intermediate_size=32,
                      num_hidden_layers=2, num_attention_heads=2,
                      max_position_embeddings=77, eos_token_id=1,
                      projection_dim=8)


def make_tiny_sd35_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight SD3.5 checkpoint (diffusers layout)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.models.dits.sd3 import (SD3ArchConfig,
                                               SD3Transformer2DModel)
    from fastvideo_tpu.models.encoders.clip import (CLIPTextArchConfig,
                                                    CLIPTextModel)
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.vaes.autoencoder_kl import (
        AutoencoderKL, AutoencoderKLArchConfig)

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "StableDiffusion3Pipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "CLIPTextModelWithProjection"],
            "text_encoder_2": ["transformers",
                               "CLIPTextModelWithProjection"],
            "text_encoder_3": ["transformers", "T5EncoderModel"],
            "tokenizer": ["transformers", "CLIPTokenizer"],
            "tokenizer_2": ["transformers", "CLIPTokenizer"],
            "tokenizer_3": ["transformers", "T5TokenizerFast"],
            "transformer": ["diffusers", "SD3Transformer2DModel"],
            "vae": ["diffusers", "AutoencoderKL"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "SD3Transformer2DModel",
                   **TINY_SD3_DIT}, fh)
    arch = SD3ArchConfig(**{k: tuple(v) if isinstance(v, list) else v
                            for k, v in TINY_SD3_DIT.items()})
    dit = SD3Transformer2DModel(arch, param_dtype=jnp.float32,
                                rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKL", **TINY_KL_VAE}, fh)
    varch = AutoencoderKLArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_KL_VAE.items()})
    vae = AutoencoderKL(varch, param_dtype=jnp.float32,
                        rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    for name, cfg_seed in (("text_encoder", seed + 2),
                           ("text_encoder_2", seed + 3)):
        edir = os.path.join(root, name)
        os.makedirs(edir, exist_ok=True)
        with open(os.path.join(edir, "config.json"), "w") as fh:
            json.dump({"architectures": ["CLIPTextModelWithProjection"],
                       **TINY_CLIP_PROJ}, fh)
        clip = CLIPTextModel(CLIPTextArchConfig(**TINY_CLIP_PROJ),
                             param_dtype=jnp.float32,
                             rngs=nnx.Rngs(cfg_seed))
        _save_safetensors(os.path.join(edir, "model.safetensors"),
                          _export_torch_layout(clip))

    e3dir = os.path.join(root, "text_encoder_3")
    os.makedirs(e3dir, exist_ok=True)
    with open(os.path.join(e3dir, "config.json"), "w") as fh:
        json.dump({"architectures": ["T5EncoderModel"],
                   **{k: v for k, v in TINY_T5.items()
                      if k != "model_type"}}, fh)
    earch_kwargs = {k: v for k, v in TINY_T5.items() if k != "model_type"}
    t5 = T5EncoderModel(T5ArchConfig(**earch_kwargs),
                        param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 4))
    _save_safetensors(os.path.join(e3dir, "model.safetensors"),
                      _export_torch_layout(t5))

    for tok in ("tokenizer", "tokenizer_2", "tokenizer_3"):
        _make_tokenizer(os.path.join(root, tok), 128)
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
            "use_dynamic_shifting": True,
        }, fh)
    return root


TINY_ZIMAGE_DIT = dict(all_patch_size=[2], all_f_patch_size=[1],
                       in_channels=4, dim=48, n_layers=1,
                       n_refiner_layers=1, n_heads=2, n_kv_heads=2,
                       cap_feat_dim=32, axes_dims=[8, 8, 8],
                       axes_lens=[64, 32, 32], adaln_embed_dim=32,
                       frequency_embedding_size=16, timestep_mid_size=32,
                       seq_multi_of=4)
TINY_QWEN3 = dict(vocab_size=128, hidden_size=32, intermediate_size=48,
                  num_hidden_layers=2, num_attention_heads=2,
                  num_key_value_heads=1, head_dim=16,
                  max_position_embeddings=2048)


def make_tiny_zimage_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight Z-Image checkpoint (diffusers layout)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.zimage import ZImageArchConfig
    from fastvideo_tpu.models.dits.zimage import ZImageTransformer2DModel
    from fastvideo_tpu.models.encoders.qwen3 import (Qwen3ArchConfig,
                                                     Qwen3EncoderModel)
    from fastvideo_tpu.models.vaes.autoencoder_kl import (
        AutoencoderKL, AutoencoderKLArchConfig)

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "ZImagePipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "Qwen3Model"],
            "tokenizer": ["transformers", "PreTrainedTokenizerFast"],
            "transformer": ["diffusers", "ZImageTransformer2DModel"],
            "vae": ["diffusers", "AutoencoderKL"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "ZImageTransformer2DModel",
                   **TINY_ZIMAGE_DIT}, fh)
    arch = ZImageArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_ZIMAGE_DIT.items()})
    dit = ZImageTransformer2DModel(arch, param_dtype=jnp.float32,
                                   rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKL", **TINY_KL_VAE}, fh)
    varch = AutoencoderKLArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_KL_VAE.items()})
    vae = AutoencoderKL(varch, param_dtype=jnp.float32,
                        rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["Qwen3Model"], **TINY_QWEN3}, fh)
    enc = Qwen3EncoderModel(Qwen3ArchConfig(**TINY_QWEN3),
                            param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(enc))

    _make_tokenizer(os.path.join(root, "tokenizer"),
                    TINY_QWEN3["vocab_size"])
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
            "shift": 3.0,
        }, fh)
    return root


TINY_FLUX_DIT = dict(patch_size=1, in_channels=16, num_layers=1,
                     num_single_layers=1, attention_head_dim=8,
                     num_attention_heads=2, joint_attention_dim=32,
                     pooled_projection_dim=16, guidance_embeds=True,
                     axes_dims_rope=[4, 2, 2])


def make_tiny_flux_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight FLUX.1 checkpoint (diffusers layout)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.models.dits.flux import (FluxArchConfig,
                                                FluxTransformer2DModel)
    from fastvideo_tpu.models.encoders.clip import (CLIPTextArchConfig,
                                                    CLIPTextModel)
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.vaes.autoencoder_kl import (
        AutoencoderKL, AutoencoderKLArchConfig)

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "FluxPipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "CLIPTextModel"],
            "text_encoder_2": ["transformers", "T5EncoderModel"],
            "tokenizer": ["transformers", "CLIPTokenizer"],
            "tokenizer_2": ["transformers", "T5TokenizerFast"],
            "transformer": ["diffusers", "FluxTransformer2DModel"],
            "vae": ["diffusers", "AutoencoderKL"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "FluxTransformer2DModel",
                   **TINY_FLUX_DIT}, fh)
    arch = FluxArchConfig(**{k: tuple(v) if isinstance(v, list) else v
                             for k, v in TINY_FLUX_DIT.items()})
    dit = FluxTransformer2DModel(arch, param_dtype=jnp.float32,
                                 rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKL", **TINY_KL_VAE}, fh)
    varch = AutoencoderKLArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_KL_VAE.items()})
    vae = AutoencoderKL(varch, param_dtype=jnp.float32,
                        rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    clip_cfg = {k: v for k, v in TINY_CLIP_TEXT.items()}
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["CLIPTextModel"], **clip_cfg}, fh)
    clip = CLIPTextModel(CLIPTextArchConfig(**clip_cfg),
                         param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(clip))

    e2dir = os.path.join(root, "text_encoder_2")
    os.makedirs(e2dir, exist_ok=True)
    earch_kwargs = {k: v for k, v in TINY_T5.items() if k != "model_type"}
    with open(os.path.join(e2dir, "config.json"), "w") as fh:
        json.dump({"architectures": ["T5EncoderModel"], **earch_kwargs}, fh)
    t5 = T5EncoderModel(T5ArchConfig(**earch_kwargs),
                        param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 3))
    _save_safetensors(os.path.join(e2dir, "model.safetensors"),
                      _export_torch_layout(t5))

    for tok in ("tokenizer", "tokenizer_2"):
        _make_tokenizer(os.path.join(root, tok), 128)
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
            "use_dynamic_shifting": True,
        }, fh)
    return root


TINY_COSMOS_DIT = dict(in_channels=5, out_channels=4,
                       num_attention_heads=2, attention_head_dim=12,
                       num_layers=2, mlp_ratio=2.0, text_embed_dim=32,
                       adaln_lora_dim=8, max_size=[16, 16, 16],
                       patch_size=[1, 2, 2], rope_scale=[1.0, 3.0, 3.0],
                       concat_padding_mask=True,
                       extra_pos_embed_type="learnable")


def make_tiny_cosmos_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight Cosmos-Predict2 checkpoint (diffusers layout)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.models.dits.cosmos import (CosmosArchConfig,
                                                  CosmosTransformer3DModel)
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "Cosmos2VideoToWorldPipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "T5EncoderModel"],
            "tokenizer": ["transformers", "T5TokenizerFast"],
            "transformer": ["diffusers", "CosmosTransformer3DModel"],
            "vae": ["diffusers", "AutoencoderKLWan"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "CosmosTransformer3DModel",
                   **TINY_COSMOS_DIT}, fh)
    arch = CosmosArchConfig(**{k: tuple(v) if isinstance(v, list) else v
                               for k, v in TINY_COSMOS_DIT.items()})
    dit = CosmosTransformer3DModel(arch, param_dtype=jnp.float32,
                                   rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLWan", **TINY_VAE}, fh)
    varch = WanVAEArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_VAE.items()})
    vae = AutoencoderKLWan(varch, param_dtype=jnp.float32,
                           rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    earch_kwargs = {k: v for k, v in TINY_T5.items() if k != "model_type"}
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["T5EncoderModel"], **earch_kwargs}, fh)
    t5 = T5EncoderModel(T5ArchConfig(**earch_kwargs),
                        param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(t5))

    _make_tokenizer(os.path.join(root, "tokenizer"), 128)
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
        }, fh)
    return root


TINY_HY15_DIT = dict(in_channels=9, out_channels=4, num_attention_heads=2,
                     attention_head_dim=8, num_layers=1,
                     num_refiner_layers=1, patch_size=1, patch_size_t=1,
                     text_embed_dim=32, text_embed_2_dim=32,
                     image_embed_dim=32, rope_theta=256.0,
                     rope_axes_dim=[4, 2, 2])
TINY_HY15_VAE = dict(latent_channels=4, block_out_channels=[8, 16, 16],
                     layers_per_block=1, spatial_compression_ratio=4,
                     temporal_compression_ratio=2, scaling_factor=1.0)
TINY_QWEN = dict(vocab_size=128, hidden_size=32, intermediate_size=48,
                 num_hidden_layers=2, num_attention_heads=2,
                 num_key_value_heads=1, max_position_embeddings=2048)
TINY_SIGLIP = dict(hidden_size=32, intermediate_size=48,
                   num_hidden_layers=1, num_attention_heads=2,
                   image_size=28, patch_size=14)


def make_tiny_hunyuan15_checkpoint(root: str, seed: int = 0,
                                   i2v: bool = False,
                                   sr: bool = False) -> str:
    """Tiny random-weight HunyuanVideo-1.5 checkpoint (diffusers layout).

    in_channels = latent(4) + cond(4) + mask(1) = 9: the hy1.5 DiT always
    receives the channel-concat condition block (zeros for T2V), matching
    /root/reference/fastvideo/pipelines/stages/image_encoding.py:168-178.
    """
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.hunyuan15 import (
        HunyuanVideo15ArchConfig)
    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.models.dits.hunyuan15 import (
        HunyuanVideo15Transformer3DModel)
    from fastvideo_tpu.models.encoders.qwen2_5 import (Qwen2ArchConfig,
                                                       Qwen2EncoderModel)
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.vaes.hunyuan15 import (
        AutoencoderKLHunyuanVideo15, Hunyuan15VAEArchConfig)

    os.makedirs(root, exist_ok=True)
    index = {
        "_class_name": ("HunyuanVideo15SRPipeline" if sr else
                        "HunyuanVideo15ImageToVideoPipeline"
                        if i2v else "HunyuanVideo15Pipeline"),
        "_diffusers_version": "0.33.0",
        "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
        "text_encoder": ["transformers", "Qwen2Model"],
        "text_encoder_2": ["transformers", "T5EncoderModel"],
        "tokenizer": ["transformers", "PreTrainedTokenizerFast"],
        "tokenizer_2": ["transformers", "PreTrainedTokenizerFast"],
        "transformer": ["diffusers", "HunyuanVideo15Transformer3DModel"],
        "vae": ["diffusers", "AutoencoderKLHunyuanVideo15"],
    }
    if i2v:
        index["image_encoder"] = ["transformers", "SiglipVisionModel"]
    if sr:
        index["transformer_2"] = ["diffusers",
                                  "HunyuanVideo15Transformer3DModel"]
        index["upsampler"] = ["diffusers", "SRTo720pUpsampler"]
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump(index, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "HunyuanVideo15Transformer3DModel",
                   **TINY_HY15_DIT}, fh)
    arch = HunyuanVideo15ArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_HY15_DIT.items()})
    dit = HunyuanVideo15Transformer3DModel(arch, param_dtype=jnp.float32,
                                           rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    if sr:
        from fastvideo_tpu.models.upsamplers.hunyuan15 import (
            SRTo720pUpsampler, SRTo720pUpsamplerConfig)

        # SR expert: latent(4) + cond(4+1) + lq(4+1) = 14 input channels
        sr_dit_cfg = dict(TINY_HY15_DIT, in_channels=14)
        t2dir = os.path.join(root, "transformer_2")
        os.makedirs(t2dir, exist_ok=True)
        with open(os.path.join(t2dir, "config.json"), "w") as fh:
            json.dump({"_class_name": "HunyuanVideo15Transformer3DModel",
                       **sr_dit_cfg}, fh)
        arch2 = HunyuanVideo15ArchConfig(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in sr_dit_cfg.items()})
        dit2 = HunyuanVideo15Transformer3DModel(
            arch2, param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 7))
        _save_safetensors(
            os.path.join(t2dir, "diffusion_pytorch_model.safetensors"),
            _export_torch_layout(dit2))

        ups_cfg = dict(in_channels=4, out_channels=4, hidden_channels=8,
                       num_blocks=1, global_residual=True)
        udir = os.path.join(root, "upsampler")
        os.makedirs(udir, exist_ok=True)
        with open(os.path.join(udir, "config.json"), "w") as fh:
            json.dump({"_class_name": "SRTo720pUpsampler", **ups_cfg}, fh)
        upsampler = SRTo720pUpsampler(SRTo720pUpsamplerConfig(**ups_cfg),
                                      param_dtype=jnp.float32,
                                      rngs=nnx.Rngs(seed + 8))
        _save_safetensors(
            os.path.join(udir, "diffusion_pytorch_model.safetensors"),
            _export_torch_layout(upsampler))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLHunyuanVideo15",
                   **TINY_HY15_VAE}, fh)
    varch = Hunyuan15VAEArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_HY15_VAE.items()})
    vae = AutoencoderKLHunyuanVideo15(varch, param_dtype=jnp.float32,
                                      rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["Qwen2Model"], **TINY_QWEN}, fh)
    qwen = Qwen2EncoderModel(Qwen2ArchConfig(**TINY_QWEN),
                             param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(qwen))

    e2dir = os.path.join(root, "text_encoder_2")
    os.makedirs(e2dir, exist_ok=True)
    byt5_kwargs = {k: v for k, v in TINY_T5.items() if k != "model_type"}
    with open(os.path.join(e2dir, "config.json"), "w") as fh:
        json.dump({"architectures": ["T5EncoderModel"], **byt5_kwargs}, fh)
    byt5 = T5EncoderModel(T5ArchConfig(**byt5_kwargs),
                          param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 3))
    _save_safetensors(os.path.join(e2dir, "model.safetensors"),
                      _export_torch_layout(byt5))

    if i2v:
        from fastvideo_tpu.models.encoders.siglip import (
            SiglipVisionArchConfig, SiglipVisionModel)

        idir = os.path.join(root, "image_encoder")
        os.makedirs(idir, exist_ok=True)
        with open(os.path.join(idir, "config.json"), "w") as fh:
            json.dump({"architectures": ["SiglipVisionModel"],
                       **TINY_SIGLIP}, fh)
        sig = SiglipVisionModel(SiglipVisionArchConfig(**TINY_SIGLIP),
                                param_dtype=jnp.float32,
                                rngs=nnx.Rngs(seed + 4))
        _save_safetensors(os.path.join(idir, "model.safetensors"),
                          _export_torch_layout(sig))

    _make_tokenizer(os.path.join(root, "tokenizer"),
                    TINY_QWEN["vocab_size"])
    _make_tokenizer(os.path.join(root, "tokenizer_2"), 128)
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
            "shift": 5.0,
        }, fh)
    return root


TINY_FLUX2_DIT = dict(in_channels=16, num_layers=1, num_single_layers=2,
                      attention_head_dim=8, num_attention_heads=2,
                      joint_attention_dim=96, timestep_guidance_channels=16,
                      mlp_ratio=3.0, axes_dims_rope=[2, 2, 2, 2],
                      rope_theta=2000.0, guidance_embeds=True)
TINY_FLUX2_VAE = dict(latent_channels=4, block_out_channels=[8, 16],
                      layers_per_block=1, norm_num_groups=4,
                      attn_encoder_blocks=[1], attn_decoder_blocks=[0],
                      patch_size=[2, 2])
TINY_MISTRAL = dict(vocab_size=128, hidden_size=32, intermediate_size=48,
                    num_hidden_layers=2, num_attention_heads=2,
                    num_key_value_heads=1, head_dim=16,
                    max_position_embeddings=2048)


def make_tiny_flux2_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight FLUX.2 checkpoint (diffusers layout)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.flux_2 import (Flux2ArchConfig,
                                                  Flux2Transformer2DModel)
    from fastvideo_tpu.models.encoders.mistral import (MistralArchConfig,
                                                       MistralEncoderModel)
    from fastvideo_tpu.models.vaes.flux2 import (AutoencoderKLFlux2,
                                                 Flux2VAEArchConfig)

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "Flux2Pipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "MistralModel"],
            "tokenizer": ["transformers", "PreTrainedTokenizerFast"],
            "transformer": ["diffusers", "Flux2Transformer2DModel"],
            "vae": ["diffusers", "AutoencoderKLFlux2"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "Flux2Transformer2DModel",
                   **TINY_FLUX2_DIT}, fh)
    arch = Flux2ArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_FLUX2_DIT.items()})
    dit = Flux2Transformer2DModel(arch, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLFlux2", **TINY_FLUX2_VAE},
                  fh)
    varch = Flux2VAEArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_FLUX2_VAE.items()})
    vae = AutoencoderKLFlux2(varch, param_dtype=jnp.float32,
                             rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["MistralModel"], **TINY_MISTRAL}, fh)
    enc = MistralEncoderModel(MistralArchConfig(**TINY_MISTRAL),
                              param_dtype=jnp.float32,
                              rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(enc))

    _make_tokenizer(os.path.join(root, "tokenizer"),
                    TINY_MISTRAL["vocab_size"])
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
            "use_dynamic_shifting": True,
        }, fh)
    return root


TINY_K5_DIT = dict(in_visual_dim=4, in_text_dim=32, in_text_dim2=16,
                   time_dim=24, out_visual_dim=4, patch_size=[1, 2, 2],
                   model_dim=16, ff_dim=32, num_text_blocks=1,
                   num_visual_blocks=1, axes_dims=[4, 2, 2])


def make_tiny_kandinsky5_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight Kandinsky-5.0 checkpoint (diffusers layout)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.kandinsky5 import (
        Kandinsky5ArchConfig, Kandinsky5Transformer3DModel)
    from fastvideo_tpu.models.encoders.clip import (CLIPTextArchConfig,
                                                    CLIPTextModel)
    from fastvideo_tpu.models.encoders.qwen2_5 import (Qwen2ArchConfig,
                                                       Qwen2EncoderModel)
    from fastvideo_tpu.models.vaes.hunyuan import (AutoencoderKLHunyuanVideo,
                                                   HunyuanVAEArchConfig)

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "Kandinsky5Pipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "Qwen2Model"],
            "text_encoder_2": ["transformers", "CLIPTextModel"],
            "tokenizer": ["transformers", "PreTrainedTokenizerFast"],
            "tokenizer_2": ["transformers", "PreTrainedTokenizerFast"],
            "transformer": ["diffusers", "Kandinsky5Transformer3DModel"],
            "vae": ["diffusers", "AutoencoderKLHunyuanVideo"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "Kandinsky5Transformer3DModel",
                   **TINY_K5_DIT}, fh)
    arch = Kandinsky5ArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_K5_DIT.items()})
    dit = Kandinsky5Transformer3DModel(arch, param_dtype=jnp.float32,
                                       rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLHunyuanVideo",
                   **TINY_HY_VAE}, fh)
    varch = HunyuanVAEArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_HY_VAE.items()})
    vae = AutoencoderKLHunyuanVideo(varch, param_dtype=jnp.float32,
                                    rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["Qwen2Model"], **TINY_QWEN}, fh)
    qwen = Qwen2EncoderModel(Qwen2ArchConfig(**TINY_QWEN),
                             param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(qwen))

    e2dir = os.path.join(root, "text_encoder_2")
    os.makedirs(e2dir, exist_ok=True)
    with open(os.path.join(e2dir, "config.json"), "w") as fh:
        json.dump({"architectures": ["CLIPTextModel"], **TINY_CLIP_TEXT},
                  fh)
    clip = CLIPTextModel(CLIPTextArchConfig(**TINY_CLIP_TEXT),
                         param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 3))
    _save_safetensors(os.path.join(e2dir, "model.safetensors"),
                      _export_torch_layout(clip))

    _make_tokenizer(os.path.join(root, "tokenizer"),
                    TINY_QWEN["vocab_size"])
    _make_tokenizer(os.path.join(root, "tokenizer_2"),
                    TINY_CLIP_TEXT["vocab_size"])
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
            "shift": 5.0,
        }, fh)
    return root


TINY_COSMOS25_DIT = dict(in_channels=4, out_channels=4,
                         num_attention_heads=2, attention_head_dim=12,
                         num_layers=1, mlp_ratio=2.0, text_embed_dim=24,
                         adaln_lora_dim=8, patch_size=[1, 2, 2],
                         max_size=[16, 32, 32], rope_scale=[1.0, 1.0, 1.0],
                         use_crossattn_projection=True,
                         crossattn_proj_in_channels=128)


def make_tiny_cosmos25_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight Cosmos-Predict2.5 checkpoint.

    crossattn_proj_in_channels = (num_layers+2) * hidden of the tiny Qwen
    (Reason1 full-concat stacks every hidden state: (2 layers + embed +
    final) * 32 = 128).
    """
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.cosmos2_5 import (
        Cosmos25ArchConfig, Cosmos25Transformer3DModel)
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.models.encoders.qwen2_5 import (Qwen2ArchConfig,
                                                       Qwen2EncoderModel)
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "Cosmos2_5Pipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "Qwen2Model"],
            "tokenizer": ["transformers", "PreTrainedTokenizerFast"],
            "transformer": ["diffusers", "Cosmos25Transformer3DModel"],
            "vae": ["diffusers", "AutoencoderKLWan"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "Cosmos25Transformer3DModel",
                   **TINY_COSMOS25_DIT}, fh)
    arch = Cosmos25ArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_COSMOS25_DIT.items()})
    dit = Cosmos25Transformer3DModel(arch, param_dtype=jnp.float32,
                                     rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLWan", **TINY_VAE}, fh)
    varch = WanVAEArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_VAE.items()})
    vae = AutoencoderKLWan(varch, param_dtype=jnp.float32,
                           rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["Qwen2Model"], **TINY_QWEN}, fh)
    qwen = Qwen2EncoderModel(Qwen2ArchConfig(**TINY_QWEN),
                             param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(qwen))

    _make_tokenizer(os.path.join(root, "tokenizer"),
                    TINY_QWEN["vocab_size"])
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
            "shift": 5.0,
        }, fh)
    return root


TINY_LTX2_DIT = dict(num_attention_heads=2, attention_head_dim=8,
                     in_channels=8, out_channels=8, num_layers=1,
                     cross_attention_dim=16, caption_channels=32,
                     audio_num_attention_heads=2,
                     audio_attention_head_dim=8,
                     # audio tokens flatten (channels * mel) = 8 * 16
                     audio_in_channels=128, audio_out_channels=128,
                     audio_cross_attention_dim=16, rope_type="split")
TINY_LTX2_VAE = dict(latent_channels=8, patch_size=2,
                     encoder_blocks=[["res_x", {"num_layers": 1}],
                                     ["compress_all_res",
                                      {"multiplier": 2}],
                                     ["res_x", {"num_layers": 1}]],
                     decoder_blocks=[["res_x", {"num_layers": 1}],
                                     ["compress_all",
                                      {"residual": True, "multiplier": 2}],
                                     ["res_x", {"num_layers": 1}]],
                     causal_decoder=False, timestep_conditioning=True)
TINY_GEMMA = dict(vocab_size=128, hidden_size=32, intermediate_size=48,
                  num_hidden_layers=2, num_attention_heads=2,
                  num_key_value_heads=1, head_dim=16,
                  max_position_embeddings=512)


def make_tiny_ltx2_checkpoint(root: str, seed: int = 0,
                              with_connector: bool = False,
                              with_upsampler: bool = False) -> str:
    """Tiny random-weight LTX-2 checkpoint (diffusers layout).

    caption_channels must equal the Gemma hidden size (32; the
    connector-less text path feeds hidden states directly).
    ``with_connector`` swaps the text encoder for the full
    LTX2GemmaTextEncoderModel (backbone + feature extractor + dual
    connectors, inner dim 32). ``with_upsampler`` ships a
    spatial_upscaler/ dir for the stage-2 refine path.
    """
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.ltx2 import (LTX2ArchConfig,
                                                LTX2Transformer3DModel)
    from fastvideo_tpu.models.encoders.gemma import (GemmaArchConfig,
                                                     GemmaEncoderModel)
    from fastvideo_tpu.models.vaes.ltx2 import (LTX2CausalVideoAutoencoder,
                                                LTX2VAEArchConfig)

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "LTX2Pipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "GemmaModel"],
            "tokenizer": ["transformers", "PreTrainedTokenizerFast"],
            "transformer": ["diffusers", "LTX2Transformer3DModel"],
            "vae": ["diffusers", "LTX2CausalVideoAutoencoder"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    dit_cfg = dict(TINY_LTX2_DIT)
    dit_cfg["caption_channels"] = TINY_GEMMA["hidden_size"]
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "LTX2Transformer3DModel", **dit_cfg}, fh)
    arch = LTX2ArchConfig(**dit_cfg)
    dit = LTX2Transformer3DModel(arch, param_dtype=jnp.float32,
                                 rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "LTX2CausalVideoAutoencoder",
                   **TINY_LTX2_VAE}, fh)
    varch = LTX2VAEArchConfig(**{
        k: (tuple((n, dict(p)) for n, p in v)
            if k.endswith("_blocks") else v)
        for k, v in TINY_LTX2_VAE.items()})
    vae = LTX2CausalVideoAutoencoder(varch, param_dtype=jnp.float32,
                                     rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    if with_connector:
        from fastvideo_tpu.models.encoders.ltx2_gemma import (
            LTX2GemmaArchConfig, LTX2GemmaTextEncoderModel)

        conn_cfg = dict(
            TINY_GEMMA,
            feature_extractor_in_features=(
                TINY_GEMMA["hidden_size"] *
                (TINY_GEMMA["num_hidden_layers"] + 1)),
            feature_extractor_out_features=TINY_GEMMA["hidden_size"],
            connector_num_attention_heads=2,
            connector_attention_head_dim=16,
            connector_num_layers=1,
            connector_num_learnable_registers=4,
            connector_positional_embedding_max_pos=[64])
        with open(os.path.join(edir, "config.json"), "w") as fh:
            json.dump({"architectures": ["LTX2GemmaTextEncoderModel"],
                       **conn_cfg}, fh)
        import dataclasses as _dc

        valid = {f.name for f in _dc.fields(LTX2GemmaArchConfig)}
        arch_kwargs = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in conn_cfg.items() if k in valid
        }
        enc = LTX2GemmaTextEncoderModel(LTX2GemmaArchConfig(**arch_kwargs),
                                        param_dtype=jnp.float32,
                                        rngs=nnx.Rngs(seed + 2))
    else:
        with open(os.path.join(edir, "config.json"), "w") as fh:
            json.dump({"architectures": ["GemmaModel"], **TINY_GEMMA}, fh)
        enc = GemmaEncoderModel(GemmaArchConfig(**TINY_GEMMA),
                                param_dtype=jnp.float32,
                                rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(enc))

    if with_upsampler:
        from fastvideo_tpu.models.upsamplers.ltx2_upsampler import (
            LTX2UpsamplerArchConfig, LatentUpsampler)

        udir = os.path.join(root, "spatial_upscaler")
        os.makedirs(udir, exist_ok=True)
        ucfg = dict(in_channels=TINY_LTX2_VAE["latent_channels"],
                    mid_channels=32, num_blocks_per_stage=1,
                    spatial_upsample=True)
        with open(os.path.join(udir, "config.json"), "w") as fh:
            json.dump({"_class_name": "LTX2LatentUpsampler", **ucfg}, fh)
        ups = LatentUpsampler(LTX2UpsamplerArchConfig(**ucfg),
                              param_dtype=jnp.float32,
                              rngs=nnx.Rngs(seed + 3))
        _save_safetensors(
            os.path.join(udir, "diffusion_pytorch_model.safetensors"),
            _export_torch_layout(ups))

    _make_tokenizer(os.path.join(root, "tokenizer"),
                    TINY_GEMMA["vocab_size"])
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000}, fh)
    return root


# head_dim >= 64: the SA rope uses rot_dim = max(head_dim // 2, 32)
TINY_SA_DIT = dict(io_channels=4, embed_dim=128, depth=2,
                   num_attention_heads=2, cond_token_dim=128,
                   global_cond_dim=256, project_cond_tokens=False,
                   project_global_cond=True)
TINY_SA_VAE = dict(encoder_hidden_size=8, downsampling_ratios=[2, 2],
                   channel_multiples=[1, 2], decoder_channels=8,
                   decoder_input_channels=4, audio_channels=2,
                   sampling_rate=400)
TINY_SA_COND = dict(cond_dim=128, number_embed_dim=8,
                    cross_attention_cond_ids=["prompt", "seconds_start",
                                              "seconds_total"],
                    global_cond_ids=["seconds_start", "seconds_total"],
                    min_val=0.0, max_val=512.0, t5_max_length=8,
                    t5=dict(vocab_size=64, d_model=128, d_kv=8, d_ff=24,
                            num_layers=2, num_heads=2,
                            feed_forward_proj="relu"))


def make_tiny_stable_audio_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight Stable Audio Open checkpoint (diffusers layout):
    StableAudioDiT + OobleckVAE + multi-conditioner (T5 + numbers)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.stable_audio import StableAudioDiT
    from fastvideo_tpu.configs.models.dits.stable_audio import (
        StableAudioArchConfig)
    from fastvideo_tpu.models.encoders.stable_audio_conditioner import (
        StableAudioConditionerArchConfig, StableAudioMultiConditioner)
    from fastvideo_tpu.models.vaes.oobleck import (OobleckVAE,
                                                   OobleckVAEArchConfig)

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "StableAudioPipeline",
            "_diffusers_version": "0.33.0",
            "transformer": ["fastvideo", "StableAudioDiT"],
            "vae": ["fastvideo", "OobleckVAE"],
            "conditioner": ["fastvideo", "StableAudioMultiConditioner"],
        }, fh)

    def tup(d):
        return {k: tuple(v) if isinstance(v, list) else v
                for k, v in d.items()}

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "StableAudioDiT", **TINY_SA_DIT}, fh)
    dit = StableAudioDiT(StableAudioArchConfig(**TINY_SA_DIT),
                         param_dtype=jnp.float32, rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "OobleckVAE", **TINY_SA_VAE}, fh)
    vae = OobleckVAE(OobleckVAEArchConfig(**tup(TINY_SA_VAE)),
                     param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    cdir = os.path.join(root, "conditioner")
    os.makedirs(cdir, exist_ok=True)
    with open(os.path.join(cdir, "config.json"), "w") as fh:
        json.dump({"architectures": ["StableAudioMultiConditioner"],
                   **TINY_SA_COND}, fh)
    cond_cfg = StableAudioConditionerArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_SA_COND.items()})
    cond = StableAudioMultiConditioner(cond_cfg, param_dtype=jnp.float32,
                                       rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(cdir, "model.safetensors"),
                      _export_torch_layout(cond))
    _make_tokenizer(os.path.join(cdir, "tokenizer"),
                    TINY_SA_COND["t5"]["vocab_size"])
    return root


TINY_GLM_DIT = dict(num_attention_heads=2, attention_head_dim=16,
                    in_channels=4, out_channels=4, num_layers=2,
                    text_embed_dim=24, time_embed_dim=32, condition_dim=8,
                    prior_vq_quantizer_codebook_size=32, patch_size=2)
TINY_GLM_VAE = dict(in_channels=3, out_channels=3, latent_channels=4,
                    block_out_channels=[8, 8, 16, 16], layers_per_block=1,
                    norm_num_groups=4, scaling_factor=1.0, shift_factor=0.0,
                    latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
                    mid_block_add_attention=False)
TINY_GLM_T5 = dict(vocab_size=64, d_model=24, d_kv=8, d_ff=32, num_layers=2,
                   num_heads=2, feed_forward_proj="relu", model_type="t5")


def make_tiny_glm_image_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight GLM-Image checkpoint (diffusers layout)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.glm_image import GlmImageArchConfig
    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.models.dits.glm_image import GlmImageTransformer2DModel
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.vaes.autoencoder_kl import (
        AutoencoderKL, AutoencoderKLArchConfig)

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "GlmImagePipeline",
            "_diffusers_version": "0.33.0",
            "transformer": ["diffusers", "GlmImageTransformer2DModel"],
            "vae": ["diffusers", "AutoencoderKL"],
            "text_encoder": ["transformers", "T5EncoderModel"],
            "tokenizer": ["transformers", "T5TokenizerFast"],
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
        }, fh)

    def tup(d):
        return {k: tuple(v) if isinstance(v, list) else v
                for k, v in d.items()}

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "GlmImageTransformer2DModel",
                   **TINY_GLM_DIT}, fh)
    dit = GlmImageTransformer2DModel(GlmImageArchConfig(**TINY_GLM_DIT),
                                     param_dtype=jnp.float32,
                                     rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKL", **TINY_GLM_VAE}, fh)
    vae = AutoencoderKL(AutoencoderKLArchConfig(**tup(TINY_GLM_VAE)),
                        param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["T5EncoderModel"], **TINY_GLM_T5}, fh)
    earch = T5ArchConfig(**{k: v for k, v in TINY_GLM_T5.items()
                            if k != "model_type"})
    enc = T5EncoderModel(earch, param_dtype=jnp.float32,
                         rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(enc))
    _make_tokenizer(os.path.join(root, "tokenizer"),
                    TINY_GLM_T5["vocab_size"])
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 1.0}, fh)
    return root


TINY_MMX_DIT = dict(num_attention_heads=2, attention_head_dim=32,
                    hidden_size=64, num_layers=2, num_refiner_layers=1,
                    ffn_dim=96, in_channels=4, audio_in_channels=8,
                    patch_size=[1, 2, 2], text_dim=32, freq_dim=32,
                    time_embed_hidden_dim=64, time_embed_dim=48,
                    rope_freq_dim=4, rope_theta=10000.0)
TINY_MMX_VIDEO_VAE = dict(latent_channels=4, block_out_channels=[8, 8, 16],
                          layers_per_block=1,
                          spatial_downsample_factors=[2, 2, 2],
                          temporal_downsample_factors=[1, 2, 2],
                          norm_num_groups=4, decoder_num_layers=1,
                          decoder_num_attention_heads=2,
                          decoder_attention_head_dim=8,
                          decoder_num_register_tokens=2,
                          decoder_ffn_mult=2, decoder_rope_dim_ratio=0.75,
                          clip_length=17, token_drop=3,
                          latents_mean=[0.0] * 4, latents_std=[1.0] * 4)
TINY_MMX_AUDIO_VAE = dict(encoder_dim=4, encoder_rates=[2, 2],
                          latent_dim=16, latent_channels=8,
                          num_attention_heads=2, decoder_dim=16,
                          decoder_rates=[2, 2], decoder_kernel_sizes=[4, 4],
                          resblock_kernel_sizes=[3],
                          resblock_dilation_sizes=[[1, 3]],
                          sampling_rate=32000)
TINY_MMX_COND = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=8,
                     mrope_section=[2, 1, 1], vision_depth=1,
                     vision_hidden_size=16, vision_intermediate_size=24,
                     vision_num_heads=2, vision_patch_size=2,
                     vision_temporal_patch_size=2,
                     vision_spatial_merge_size=2,
                     vision_out_hidden_size=32,
                     vision_num_position_embeddings=16,
                     vision_deepstack_visual_indexes=[0])


def make_tiny_minimax_h3_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight MiniMax-H3 checkpoint (diffusers layout)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.minimax_h3 import (
        MiniMaxH3ArchConfig)
    from fastvideo_tpu.models.dits.minimax_h3 import (
        MiniMaxH3Transformer3DModel)
    from fastvideo_tpu.models.encoders.minimax_h3_qwen3_vl import (
        MiniMaxH3Qwen3VLArchConfig, MiniMaxH3Qwen3VLConditioner)
    from fastvideo_tpu.models.vaes.minimax_h3_audio import (
        MiniMaxH3AudioVAE, MiniMaxH3AudioVAEArchConfig)
    from fastvideo_tpu.models.vaes.minimax_h3_video import (
        AutoencoderKLMiniMaxH3, MiniMaxH3VideoVAEArchConfig)

    def tup(d):
        return {k: tuple(tuple(x) if isinstance(x, list) else x
                         for x in v) if isinstance(v, list) else v
                for k, v in d.items()}

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "MiniMaxH3ModularPipeline",
            "_diffusers_version": "0.33.0",
            "transformer": ["diffusers", "MiniMaxH3Transformer3DModel"],
            "vae": ["diffusers", "AutoencoderKLMiniMaxH3"],
            "audio_vae": ["diffusers", "AutoencoderKLMiniMaxH3Audio"],
            "text_encoder": ["transformers", "MiniMaxH3Qwen3VLConditioner"],
            "tokenizer": ["transformers", "PreTrainedTokenizerFast"],
            "scheduler": ["diffusers", "MiniMaxH3Scheduler"],
            "audio_scheduler": ["diffusers", "MiniMaxH3Scheduler"],
        }, fh)

    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "MiniMaxH3Transformer3DModel",
                   **TINY_MMX_DIT}, fh)
    dit = MiniMaxH3Transformer3DModel(
        MiniMaxH3ArchConfig(**tup(TINY_MMX_DIT)), param_dtype=jnp.float32,
        rngs=nnx.Rngs(seed))
    _save_safetensors(
        os.path.join(tdir, "diffusion_pytorch_model.safetensors"),
        _export_torch_layout(dit))

    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLMiniMaxH3",
                   **TINY_MMX_VIDEO_VAE}, fh)
    vae = AutoencoderKLMiniMaxH3(
        MiniMaxH3VideoVAEArchConfig(**tup(TINY_MMX_VIDEO_VAE)),
        rngs=nnx.Rngs(seed + 1))
    _save_safetensors(
        os.path.join(vdir, "diffusion_pytorch_model.safetensors"),
        _export_torch_layout(vae))

    adir = os.path.join(root, "audio_vae")
    os.makedirs(adir, exist_ok=True)
    with open(os.path.join(adir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLMiniMaxH3Audio",
                   **TINY_MMX_AUDIO_VAE}, fh)
    avae = MiniMaxH3AudioVAE(
        MiniMaxH3AudioVAEArchConfig(**tup(TINY_MMX_AUDIO_VAE)),
        rngs=nnx.Rngs(seed + 2))
    _save_safetensors(
        os.path.join(adir, "diffusion_pytorch_model.safetensors"),
        _export_torch_layout(avae))

    edir = os.path.join(root, "text_encoder")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["MiniMaxH3Qwen3VLConditioner"],
                   **TINY_MMX_COND}, fh)
    cond = MiniMaxH3Qwen3VLConditioner(
        MiniMaxH3Qwen3VLArchConfig(**tup(TINY_MMX_COND)),
        param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 3))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(cond))
    _make_tokenizer(os.path.join(root, "tokenizer"),
                    TINY_MMX_COND["vocab_size"])

    for name, shift in (("scheduler", 12.0), ("audio_scheduler", 3.0)):
        sdir = os.path.join(root, name)
        os.makedirs(sdir, exist_ok=True)
        with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
            json.dump({"_class_name": "MiniMaxH3Scheduler",
                       "shift": shift}, fh)
    return root


TINY_DX_DIT = dict(num_attention_heads=2, attention_head_dim=24,
                   in_channels=4, out_channels=4, text_dim=32, freq_dim=32,
                   ffn_dim=64, num_layers=2, patch_size=[1, 2, 2],
                   qk_norm="rms_norm_across_heads", cross_attn_norm=True,
                   eps=1e-6, attn_compress=2)


def make_tiny_dreamx_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight DreamX-World-5B-Cam checkpoint."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.dreamx_world import (
        DreamXWorldArchConfig)
    from fastvideo_tpu.models.dits.dreamx_world import (
        DreamXWorldTransformer3DModel)

    make_tiny_wan_checkpoint(root, seed=seed)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "DreamXWorldPipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "UMT5EncoderModel"],
            "tokenizer": ["transformers", "T5TokenizerFast"],
            "transformer": ["diffusers", "DreamXWorldTransformer3DModel"],
            "vae": ["diffusers", "AutoencoderKLWan"],
        }, fh)
    tdir = os.path.join(root, "transformer")
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "DreamXWorldTransformer3DModel",
                   **TINY_DX_DIT}, fh)
    arch = DreamXWorldArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_DX_DIT.items()
    })
    dit = DreamXWorldTransformer3DModel(arch, param_dtype=jnp.float32,
                                        rngs=nnx.Rngs(seed))
    sd = _export_torch_layout(dit)
    # the camera adapter's out_proj is zero-init (identity adapter); give
    # the test checkpoint a nonzero one so camera actions affect output
    rng = np.random.default_rng(seed + 9)
    for k in sd:
        if "cam_self_attn.out_proj.weight" in k:
            sd[k] = rng.standard_normal(sd[k].shape).astype(
                np.float32) * 0.05
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      sd)
    return root


def make_tiny_dreamx_ar_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny DreamX-World AR (causal forcing) checkpoint."""
    import json as _json

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.dreamx_world_ar import (
        DreamXWorldARArchConfig, DreamXWorldARTransformer3DModel)

    make_tiny_wan_checkpoint(root, seed=seed)
    index = _json.load(open(os.path.join(root, "model_index.json")))
    index["_class_name"] = "DreamXWorldARPipeline"
    index["transformer"] = ["diffusers", "DreamXWorldARTransformer3DModel"]
    _json.dump(index, open(os.path.join(root, "model_index.json"), "w"))

    tdir = os.path.join(root, "transformer")
    dit_cfg = dict(TINY_DX_DIT, local_attn_size=4, sink_size=1,
                   num_frames_per_block=2,
                   cam_self_attn_layers=[0, 1])
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        _json.dump({"_class_name": "DreamXWorldARTransformer3DModel",
                    **dit_cfg}, fh)
    arch = DreamXWorldARArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in dit_cfg.items()
    })
    dit = DreamXWorldARTransformer3DModel(arch, param_dtype=jnp.float32,
                                          rngs=nnx.Rngs(seed))
    sd = _export_torch_layout(dit)
    rng = np.random.default_rng(seed + 9)
    for k in sd:
        # zero-init camera adapter would make conditioning a no-op
        if "cam_self_attn.out_proj.weight" in k:
            sd[k] = rng.standard_normal(sd[k].shape).astype(
                np.float32) * 0.05
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      sd)
    return root


TINY_LBV_DIT = dict(patch_size=[1, 2, 2], in_channels=4, out_channels=4,
                    hidden_size=48, num_attention_heads=2, depth=2,
                    intermediate_size=64, text_dim=32, freq_dim=32,
                    axes_dims=[8, 8, 8], axes_lens=[64, 32, 32],
                    num_experts=0)
TINY_LBV_TEXT = dict(vocab_size=128, hidden_size=32, intermediate_size=48,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=8,
                     rope_theta=5000000.0)


def make_tiny_lingbot_video_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight LingBot-Video Dense checkpoint."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.lingbot_video import (
        LingBotVideoArchConfig)
    from fastvideo_tpu.models.dits.lingbot_video import (
        LingBotVideoTransformer3DModel)
    from fastvideo_tpu.models.encoders.lingbot_video import (
        LingBotVideoQwen3VLTextArchConfig, LingBotVideoQwen3VLTextModel)

    make_tiny_wan_checkpoint(root, seed=seed)  # reuse the tiny Wan VAE
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "LingBotVideoPipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "LingBotVideoQwen3VLTextModel"],
            "tokenizer": ["transformers", "PreTrainedTokenizerFast"],
            "transformer": ["diffusers", "LingBotVideoTransformer3DModel"],
            "vae": ["diffusers", "AutoencoderKLWan"],
        }, fh)

    def tup(d):
        return {k: tuple(v) if isinstance(v, list) else v
                for k, v in d.items()}

    tdir = os.path.join(root, "transformer")
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "LingBotVideoTransformer3DModel",
                   **TINY_LBV_DIT}, fh)
    dit = LingBotVideoTransformer3DModel(
        LingBotVideoArchConfig(**tup(TINY_LBV_DIT)),
        param_dtype=jnp.float32, rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    edir = os.path.join(root, "text_encoder")
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["LingBotVideoQwen3VLTextModel"],
                   **TINY_LBV_TEXT}, fh)
    enc = LingBotVideoQwen3VLTextModel(
        LingBotVideoQwen3VLTextArchConfig(**TINY_LBV_TEXT),
        param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(enc))

    sdir = os.path.join(root, "scheduler")
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 3.0}, fh)
    return root


TINY_MG3_ACTION = {
    "blocks": [0], "enable_mouse": True, "enable_keyboard": True,
    "heads_num": 2, "hidden_size": 8, "img_hidden_size": 48,
    "keyboard_dim_in": 6, "keyboard_hidden_dim": 128, "mouse_dim_in": 2,
    "mouse_hidden_dim": 128, "mouse_qk_dim_list": [32, 16, 16],
    "patch_size": [1, 2, 2], "qk_norm": True, "qkv_bias": False,
    "rope_dim_list": [32, 16, 16], "rope_theta": 256,
    "vae_time_compression_ratio": 4, "windows_size": 3,
}
TINY_MG3_DIT = dict(num_attention_heads=2, attention_head_dim=24,
                    in_channels=4, out_channels=4, text_dim=32, freq_dim=32,
                    ffn_dim=64, num_layers=2, patch_size=[1, 2, 2],
                    qk_norm="rms_norm_across_heads", cross_attn_norm=True,
                    eps=1e-6, use_memory=False, sigma_theta=0.0,
                    action_config=TINY_MG3_ACTION)
TINY_MG3_VAE = dict(base_dim=8, z_dim=4, dim_mult=[1, 2, 2],
                    num_res_blocks=1, attn_scales=[],
                    temperal_downsample=[True, True],
                    latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
                    scale_factor_temporal=4, scale_factor_spatial=4)


def make_tiny_matrixgame2_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny Matrix-Game 2.0 I2V checkpoint (CLIP image cond, no text)."""
    import json as _json

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.clip import (
        CLIPVisionArchConfig)
    from fastvideo_tpu.models.dits.matrixgame2 import (MatrixGame2ArchConfig,
                                                       MatrixGame2WanModel)
    from fastvideo_tpu.models.encoders.clip import CLIPVisionModel

    make_tiny_wan_checkpoint(root, seed=seed)
    # no text stream: drop the text encoder/tokenizer dirs
    import shutil
    shutil.rmtree(os.path.join(root, "text_encoder"), ignore_errors=True)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        _json.dump({
            "_class_name": "MatrixGame2I2VPipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "UniPCMultistepScheduler"],
            "transformer": ["diffusers", "MatrixGame2WanModel"],
            "vae": ["diffusers", "AutoencoderKLWan"],
            "image_encoder": ["transformers",
                              "CLIPVisionModelWithProjection"],
        }, fh)

    # align the action module's temporal fold with the tiny VAE (tr=2)
    action = dict(TINY_MG3_ACTION, keyboard_dim_in=4, img_hidden_size=48,
                  vae_time_compression_ratio=TINY_VAE[
                      "scale_factor_temporal"], windows_size=2)
    # i2v channel concat: z(4) + mask(tr=2) + cond(4) = 10
    dit_cfg = dict(num_attention_heads=2, attention_head_dim=24,
                   in_channels=10, out_channels=4, text_dim=32,
                   freq_dim=32, ffn_dim=64, num_layers=2,
                   patch_size=[1, 2, 2],
                   qk_norm="rms_norm_across_heads", cross_attn_norm=True,
                   eps=1e-6, use_memory=False, sigma_theta=0.0,
                   image_dim=TINY_CLIP["hidden_size"],
                   action_config=action)
    tdir = os.path.join(root, "transformer")
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        _json.dump({"_class_name": "MatrixGame2WanModel", **dit_cfg}, fh)
    arch = MatrixGame2ArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in dit_cfg.items() if k != "action_config"
    }, action_config=action)
    dit = MatrixGame2WanModel(arch, param_dtype=jnp.float32,
                              rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    idir = os.path.join(root, "image_encoder")
    os.makedirs(idir, exist_ok=True)
    _json.dump({"architectures": ["CLIPVisionModelWithProjection"],
                **TINY_CLIP}, open(os.path.join(idir, "config.json"), "w"))
    clip = CLIPVisionModel(CLIPVisionArchConfig(**TINY_CLIP),
                           param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 5))
    _save_safetensors(os.path.join(idir, "model.safetensors"),
                      _export_torch_layout(clip))
    return root


def make_tiny_matrixgame3_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight Matrix-Game 3.0 checkpoint (4x temporal VAE)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.matrixgame3 import (
        MatrixGame3ArchConfig)
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.models.dits.matrixgame3 import MatrixGame3WanModel
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    make_tiny_wan_checkpoint(root, seed=seed)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "MatrixGame3I2VPipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "UniPCMultistepScheduler"],
            "text_encoder": ["transformers", "UMT5EncoderModel"],
            "tokenizer": ["transformers", "T5TokenizerFast"],
            "transformer": ["diffusers", "MatrixGame3WanModel"],
            "light_vae": ["diffusers", "AutoencoderKLWan"],
        }, fh)

    def tup(d):
        return {k: tuple(v) if isinstance(v, list) else v
                for k, v in d.items() if k != "action_config"}

    tdir = os.path.join(root, "transformer")
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "MatrixGame3WanModel", **TINY_MG3_DIT},
                  fh)
    dit = MatrixGame3WanModel(
        MatrixGame3ArchConfig(**tup(TINY_MG3_DIT),
                              action_config=TINY_MG3_ACTION),
        param_dtype=jnp.float32, rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    # 4x-temporal light VAE in its own dir
    import shutil
    vdir = os.path.join(root, "light_vae")
    shutil.rmtree(os.path.join(root, "vae"), ignore_errors=True)
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "AutoencoderKLWan", **TINY_MG3_VAE}, fh)
    vae = AutoencoderKLWan(
        WanVAEArchConfig(**{k: tuple(v) if isinstance(v, list) else v
                            for k, v in TINY_MG3_VAE.items()}),
        param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 1))
    _save_safetensors(os.path.join(vdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(vae))
    return root


def make_tiny_hyworld_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight HYWorld checkpoint (hy1.5 trunk + camera/action
    DiT + streaming VAE class name)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.hyworld import HYWorldArchConfig
    from fastvideo_tpu.models.dits.hyworld import HYWorldTransformer3DModel

    make_tiny_hunyuan15_checkpoint(root, seed=seed, i2v=True)
    with open(os.path.join(root, "model_index.json")) as fh:
        index = json.load(fh)
    index["_class_name"] = "HYWorldPipeline"
    index["transformer"] = ["diffusers", "HYWorldTransformer3DModel"]
    index["vae"] = ["diffusers", "AutoencoderKLHYWorld"]
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump(index, fh)
    with open(os.path.join(root, "vae", "config.json")) as fh:
        vcfg = json.load(fh)
    vcfg["_class_name"] = "AutoencoderKLHYWorld"
    with open(os.path.join(root, "vae", "config.json"), "w") as fh:
        json.dump(vcfg, fh)

    tdir = os.path.join(root, "transformer")
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "HYWorldTransformer3DModel",
                   **TINY_HY15_DIT}, fh)
    arch = HYWorldArchConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in TINY_HY15_DIT.items()})
    dit = HYWorldTransformer3DModel(arch, param_dtype=jnp.float32,
                                    rngs=nnx.Rngs(seed))
    sd = _export_torch_layout(dit)
    # camera-PRoPE proj and action embedder are zero-init adapters; give
    # the test checkpoint nonzero ones so pose/action affect output
    rng = np.random.default_rng(seed + 11)
    for k in sd:
        if ("img_attn_prope_proj" in k or "action_in" in k) and \
                k.endswith("weight"):
            sd[k] = rng.standard_normal(sd[k].shape).astype(
                np.float32) * 0.05
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      sd)
    return root


TINY_G3C_DIT = dict(num_attention_heads=2, attention_head_dim=16,
                    in_channels=4, out_channels=4, num_layers=2,
                    mlp_ratio=2.0, text_embed_dim=32, adaln_lora_dim=16,
                    use_adaln_lora=True, max_size=[16, 16, 16],
                    rope_scale=[2.0, 1.0, 1.0], concat_padding_mask=True,
                    frame_buffer_max=2, channels_per_buffer=8)


def make_tiny_gen3c_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight GEN3C checkpoint (Wan tiny VAE + T5)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.gen3c import Gen3CArchConfig
    from fastvideo_tpu.models.dits.gen3c import Gen3CTransformer3DModel

    make_tiny_wan_checkpoint(root, seed=seed)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "Gen3CPipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
            "text_encoder": ["transformers", "T5EncoderModel"],
            "tokenizer": ["transformers", "T5TokenizerFast"],
            "transformer": ["diffusers", "Gen3CTransformer3DModel"],
            "vae": ["diffusers", "AutoencoderKLWan"],
        }, fh)
    tdir = os.path.join(root, "transformer")
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "Gen3CTransformer3DModel",
                   **TINY_G3C_DIT}, fh)

    def tup(d):
        return {k: tuple(v) if isinstance(v, list) else v
                for k, v in d.items()}

    dit = Gen3CTransformer3DModel(Gen3CArchConfig(**tup(TINY_G3C_DIT)),
                                  param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))
    sdir = os.path.join(root, "scheduler")
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as fh:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000}, fh)
    return root


TINY_MAGI_DIT = dict(num_layers=2, hidden_size=64, head_dim=16,
                     num_query_groups=2, video_in_channels=16,
                     audio_in_channels=8, text_in_channels=32,
                     mm_layers=[0], gelu7_layers=[0], post_norm_layers=[1],
                     local_attn_layers=[], enable_attn_gating=True)
TINY_T5GEMMA = dict(vocab_size=128, hidden_size=32, intermediate_size=48,
                    num_hidden_layers=2, num_attention_heads=2,
                    num_key_value_heads=1, head_dim=16, sliding_window=4,
                    query_pre_attn_scalar=16.0)
TINY_OOBLECK = dict(encoder_hidden_size=8, audio_channels=2,
                    decoder_channels=8, decoder_input_channels=8,
                    downsampling_ratios=[2, 2], channel_multiples=[1, 2])


def make_tiny_magi_human_checkpoint(root: str, seed: int = 0) -> str:
    """Tiny random-weight daVinci-MagiHuman checkpoint."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.magi_human import (
        MagiHumanArchConfig)
    from fastvideo_tpu.models.dits.magi_human import MagiHumanDiT
    from fastvideo_tpu.models.encoders.t5gemma import (T5GemmaArchConfig,
                                                       T5GemmaEncoderModel)
    from fastvideo_tpu.models.vaes.oobleck import (OobleckVAE,
                                                   OobleckVAEArchConfig)

    make_tiny_wan_checkpoint(root, seed=seed)
    with open(os.path.join(root, "model_index.json"), "w") as fh:
        json.dump({
            "_class_name": "MagiHumanPipeline",
            "_diffusers_version": "0.33.0",
            "scheduler": ["diffusers", "UniPCMultistepScheduler"],
            "text_encoder": ["transformers", "T5GemmaEncoderModel"],
            "tokenizer": ["transformers", "PreTrainedTokenizerFast"],
            "transformer": ["diffusers", "MagiHumanDiT"],
            "vae": ["diffusers", "AutoencoderKLWan"],
            "audio_vae": ["diffusers", "OobleckVAE"],
        }, fh)

    def tup(d):
        return {k: tuple(v) if isinstance(v, list) else v
                for k, v in d.items()}

    tdir = os.path.join(root, "transformer")
    with open(os.path.join(tdir, "config.json"), "w") as fh:
        json.dump({"_class_name": "MagiHumanDiT", **TINY_MAGI_DIT}, fh)
    dit = MagiHumanDiT(MagiHumanArchConfig(**tup(TINY_MAGI_DIT)),
                       param_dtype=jnp.float32, rngs=nnx.Rngs(seed))
    _save_safetensors(os.path.join(tdir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(dit))

    edir = os.path.join(root, "text_encoder")
    with open(os.path.join(edir, "config.json"), "w") as fh:
        json.dump({"architectures": ["T5GemmaEncoderModel"],
                   **TINY_T5GEMMA}, fh)
    enc = T5GemmaEncoderModel(T5GemmaArchConfig(**TINY_T5GEMMA),
                              param_dtype=jnp.float32,
                              rngs=nnx.Rngs(seed + 2))
    _save_safetensors(os.path.join(edir, "model.safetensors"),
                      _export_torch_layout(enc))

    adir = os.path.join(root, "audio_vae")
    os.makedirs(adir, exist_ok=True)
    with open(os.path.join(adir, "config.json"), "w") as fh:
        json.dump({"_class_name": "OobleckVAE", **TINY_OOBLECK}, fh)
    avae = OobleckVAE(OobleckVAEArchConfig(**tup(TINY_OOBLECK)),
                      param_dtype=jnp.float32, rngs=nnx.Rngs(seed + 3))
    _save_safetensors(os.path.join(adir,
                                   "diffusion_pytorch_model.safetensors"),
                      _export_torch_layout(avae))
    return root
