from fastvideo_tpu.models.upsamplers.hunyuan15 import (  # noqa: F401
    SRTo720pUpsampler, SRTo720pUpsamplerConfig, SRTo1080pUpsampler,
    SRTo1080pUpsamplerConfig)
