"""HYWorld VAE: the HunyuanVideo-1.5 architecture for HY-WorldPlay.

Behavioral reference: /root/reference/fastvideo/models/vaes/hyworldvae.py
(:786-988): identical layer math to hunyuan15vae (same RMS norms, DCAE
shuffle up/down blocks, first-frame temporal split) — the HYWorld variant
only adds a per-conv 2-frame feature cache so torch can stream long clips
chunk-by-chunk on a memory-constrained GPU. The cached chunked pass is
constructed to reproduce the full-clip computation (first chunk replicate-
pads, later chunks use the cached real context), so the TPU-native port
runs the fused full-clip program and inherits numerics from the
parity-tested hy1.5 VAE; tests/parity/test_hyworldvae_parity.py pins
equality against the reference's *chunked* path.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.models.vaes.hunyuan15 import (
    HUNYUAN15_VAE_PARAM_NAMES_MAPPING, AutoencoderKLHunyuanVideo15,
    Hunyuan15VAEArchConfig)

HYWORLD_VAE_PARAM_NAMES_MAPPING: dict[str, str] = dict(
    HUNYUAN15_VAE_PARAM_NAMES_MAPPING)


@dataclasses.dataclass
class HYWorldVAEArchConfig(Hunyuan15VAEArchConfig):
    pass


class AutoencoderKLHYWorld(AutoencoderKLHunyuanVideo15):
    """hy1.5 VAE numerics; the torch chunk cache is a no-op on TPU."""

    def clear_cache(self) -> None:  # reference API compatibility
        pass


EntryClass = AutoencoderKLHYWorld
