"""Generate fixed-seed end-to-end goldens from the REFERENCE (torch) code.

Analog of the reference golden-gate harness
(/root/reference/fastvideo/tests/golden_gate/_harness.py:1-60): run the
reference implementation once at fixed seeds, commit the fingerprinted
outputs, and gate the TPU pipeline against them (PSNR > 35, the
BASELINE.json fidelity bar) in tests/golden/test_golden_gate.py.

Composition covered: Wan DiT (3-step FlowUniPC denoise) -> Wan VAE decode,
tiny config, identical random weights on both sides. Run from the repo
root to (re)generate:

    python tests/golden/generate_goldens.py
"""

from __future__ import annotations

import json
import os
import platform
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, os.pardir, "parity"))
sys.path.insert(0, os.path.join(HERE, os.pardir))

TINY_DIT = dict(num_attention_heads=4, attention_head_dim=24, in_channels=4,
                out_channels=4, text_dim=32, freq_dim=32, ffn_dim=64,
                num_layers=2)
TINY_VAE = dict(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                attn_scales=(), temperal_downsample=(True,),
                latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
NUM_STEPS = 3
SHIFT = 3.0
LATENT_SHAPE = (1, 4, 3, 8, 8)  # [B, z, T, h, w]
CTX_SHAPE = (1, 16, 32)


def main() -> None:
    import ref_loader
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    dit_mod = ref_loader.import_ref("fastvideo.models.dits.wanvideo")
    vae_mod = ref_loader.import_ref("fastvideo.models.vaes.wanvae")
    sch_mod = ref_loader.import_ref(
        "fastvideo.models.schedulers.scheduling_flow_unipc_multistep")
    ref_loader.patch_cpu_sdpa()
    ref_loader.init_ref_distributed()

    import torch

    from fastvideo.configs.models.dits.wanvideo import (WanVideoArchConfig,
                                                        WanVideoConfig)
    from fastvideo.configs.models.vaes.wanvae import (WanVAEArchConfig,
                                                      WanVAEConfig)
    from fastvideo.forward_context import set_forward_context

    torch.manual_seed(0)
    dit = dit_mod.WanTransformer3DModel(
        WanVideoConfig(arch_config=WanVideoArchConfig(**TINY_DIT)), {})
    with torch.no_grad():
        for p in dit.parameters():
            torch.nn.init.normal_(p, std=0.05)
    dit.eval()

    torch.manual_seed(1)
    vae = vae_mod.AutoencoderKLWan(
        WanVAEConfig(arch_config=WanVAEArchConfig(**TINY_VAE)))
    with torch.no_grad():
        for p in vae.parameters():
            torch.nn.init.normal_(p, std=0.1)
    vae.eval()

    sched = sch_mod.FlowUniPCMultistepScheduler(shift=SHIFT)
    sched.set_timesteps(NUM_STEPS, device="cpu")

    rng = np.random.default_rng(42)
    latents0 = rng.standard_normal(LATENT_SHAPE).astype(np.float32)
    ctx = rng.standard_normal(CTX_SHAPE).astype(np.float32)

    lat = torch.from_numpy(latents0.copy())
    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        for t in sched.timesteps:
            t_arr = t.expand(1).float()
            pred = dit(lat, torch.from_numpy(ctx), t_arr)
            lat = sched.step(pred, t, lat, return_dict=False)[0]
        frames = vae.decode(lat)
        if hasattr(frames, "sample"):
            frames = frames.sample
        frames = frames.numpy()

    dit_sd = {f"dit::{k}": v.detach().numpy()
              for k, v in dit.state_dict().items()}
    vae_sd = {f"vae::{k}": v.detach().numpy()
              for k, v in vae.state_dict().items()}
    out = os.path.join(HERE, "wan_t2v_tiny_golden.npz")
    np.savez_compressed(out, frames=frames, latents0=latents0, ctx=ctx,
                        denoised=lat.numpy(), **dit_sd, **vae_sd)
    fp = {
        "generator": "reference torch CPU (ref_loader)",
        "torch": torch.__version__,
        "numpy": np.__version__,
        "python": platform.python_version(),
        "num_steps": NUM_STEPS,
        "shift": SHIFT,
        "seeds": {"dit": 0, "vae": 1, "inputs": 42},
        "tiny_dit": TINY_DIT,
        "tiny_vae": {k: list(v) if isinstance(v, tuple) else v
                     for k, v in TINY_VAE.items()},
    }
    with open(os.path.join(HERE, "wan_t2v_tiny_golden.json"), "w") as fh:
        json.dump(fp, fh, indent=1)
    print(f"wrote {out}: frames {frames.shape}, "
          f"range [{frames.min():.3f}, {frames.max():.3f}]")


if __name__ == "__main__":
    main()
