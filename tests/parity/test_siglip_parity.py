"""SigLIP vision encoder parity vs transformers SiglipVisionModel."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

TINY = dict(hidden_size=32, intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
            num_channels=3)


def test_siglip_vision_parity():
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.encoders.siglip import (
        SIGLIP_PARAM_NAMES_MAPPING, SiglipVisionArchConfig,
        SiglipVisionModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    hf_cfg = transformers.SiglipVisionConfig(**TINY,
                                             hidden_act="gelu_pytorch_tanh")
    torch.manual_seed(0)
    ref = transformers.SiglipVisionModel(hf_cfg)
    ref.eval()

    ours = SiglipVisionModel(SiglipVisionArchConfig(**TINY),
                             param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = ref.state_dict()
    n = load_weights(ours, ((k, v.numpy()) for k, v in sd.items()),
                     SIGLIP_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(pixel_values=torch.from_numpy(pixels))
    out = ours(jnp.asarray(pixels))

    err = np.abs(ref_out.last_hidden_state.numpy() -
                 np.asarray(out.last_hidden_state)).max()
    assert err < 3e-4, f"last_hidden_state max err {err}"
    err = np.abs(ref_out.pooler_output.numpy() -
                 np.asarray(out.pooler_output)).max()
    assert err < 3e-4, f"pooler_output max err {err}"
