"""CLIP vision encoder parity vs HuggingFace transformers."""

import numpy as np
import pytest


def test_clip_vision_parity():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu")
    hf = transformers.CLIPVisionModel(hf_cfg)
    hf.eval()
    torch.manual_seed(0)
    with torch.no_grad():
        for p in hf.parameters():
            torch.nn.init.normal_(p, std=0.05)

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.clip import (
        CLIP_VISION_PARAM_NAMES_MAPPING, CLIPVisionArchConfig)
    from fastvideo_tpu.models.encoders.clip import CLIPVisionModel
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = CLIPVisionArchConfig(hidden_size=64, intermediate_size=128,
                               num_hidden_layers=3, num_attention_heads=4,
                               image_size=28, patch_size=14,
                               hidden_act="quick_gelu")
    ours = CLIPVisionModel(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = hf.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     CLIP_VISION_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd)

    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(px)
                 ).last_hidden_state.numpy()
    out = np.asarray(ours(jnp.asarray(px)).last_hidden_state)
    # HF last_hidden_state is pre-post_layernorm
    out_pre = np.asarray(
        ours.vision_model(jnp.asarray(px), skip_post_norm=True))
    err = min(np.abs(ref - out).max(), np.abs(ref - out_pre).max())
    scale = np.abs(ref).max()
    assert err / scale < 2e-4, (err, scale)


def test_clip_text_parity():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=32, hidden_act="quick_gelu",
        eos_token_id=2, bos_token_id=1, pad_token_id=0)
    hf = transformers.CLIPTextModel(hf_cfg)
    hf.eval()
    torch.manual_seed(0)
    with torch.no_grad():
        for p in hf.parameters():
            torch.nn.init.normal_(p, std=0.05)

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.encoders.clip import (
        CLIP_TEXT_PARAM_NAMES_MAPPING, CLIPTextArchConfig, CLIPTextModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = CLIPTextArchConfig(vocab_size=99, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4,
                             max_position_embeddings=32, eos_token_id=2)
    ours = CLIPTextModel(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in hf.state_dict().items()
          if "position_ids" not in k}
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     CLIP_TEXT_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 99, size=(2, 12))
    ids[:, -1] = 2  # eos
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids))
        ref_h = ref.last_hidden_state.numpy()
        ref_p = ref.pooler_output.numpy()
    import jax.numpy as jnp

    out = ours(jnp.asarray(ids))
    err_h = np.abs(ref_h - np.asarray(out.last_hidden_state)).max()
    err_p = np.abs(ref_p - np.asarray(out.pooler_output)).max()
    scale = np.abs(ref_h).max()
    assert err_h / scale < 3e-4 and err_p / scale < 3e-4, (err_h, err_p)
