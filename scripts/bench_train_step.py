"""On-chip 1.3B training-step ladder (VERDICT r4 weak #5).

Measures the REAL TrainingPipeline step (fwd+bwd+grad-clip+adamw through
the jitted scaffold, data via the prefetching StatefulDataLoader analog so
host decode overlaps the device step):

  dense vs VSA-0.8 attention x remat full / ops(dots-saveable) / none

and checks the headline cell against benchmarks/train_step_1_3b.json.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_step.py
Optional arg: "quick" measures only the spec cell.
"""
import json
import os
import sys
import time

os.environ.setdefault("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.utils import enable_compilation_cache

DIT_CFG = dict(num_attention_heads=12, attention_head_dim=128,
               in_channels=16, out_channels=16, text_dim=4096, freq_dim=256,
               ffn_dim=8960, num_layers=30)


def make_loader(shape, text_len, d_text, prefetch=2):
    """(latents, embeds) batches through the real PrefetchingLoader, so
    the host 'decode' (here: synthesis) overlaps the device step."""
    from fastvideo_tpu.dataset.loader import PrefetchingLoader

    rng = np.random.default_rng(0)
    emb_shape = (shape[0], shape[1], text_len, d_text)

    def make_batch(indices):
        return (rng.standard_normal(shape).astype(np.float32),
                rng.standard_normal(emb_shape).astype(np.float32))

    sampler = [[i] for i in range(64)]
    return PrefetchingLoader(sampler, make_batch, prefetch=prefetch)


def build_pipe(remat: str, vsa: float):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
    from fastvideo_tpu.models.schedulers.flow_match_euler import (
        FlowMatchEulerDiscreteScheduler)
    from fastvideo_tpu.training.training_pipeline import TrainingPipeline

    par.destroy_mesh()
    model = WanTransformer3DModel(WanArchConfig(**DIT_CFG),
                                  param_dtype=jnp.bfloat16,
                                  rngs=nnx.Rngs(0))
    sched = FlowMatchEulerDiscreteScheduler(shift=3.0)
    sched.set_timesteps(1000)
    args = TrainingArgs(num_gpus=1, dp_size=1, learning_rate=1e-5,
                        max_grad_norm=1.0, weighting_scheme="uniform",
                        seed=0, output_dir="",
                        selective_checkpointing=remat,
                        VSA_sparsity=vsa)
    return TrainingPipeline(model, sched, args)


def measure(remat: str, vsa: float, spec, steps: int = 3):
    pipe = build_pipe(remat, vsa)
    loader = make_loader(tuple(spec["latents_shape"]), spec["text_len"],
                         DIT_CFG["text_dim"])
    it = iter(loader)
    s = vsa if vsa > 0 else None
    lat, emb = next(it)
    pipe.train_one_step(lat, emb, vsa_sparsity=s)  # compile
    times = []
    for _ in range(steps):
        lat, emb = next(it)
        t0 = time.perf_counter()
        m = pipe.train_one_step(lat, emb, vsa_sparsity=s)
        times.append(time.perf_counter() - t0)
    loader.shutdown()
    # free for real between cells: nnx modules are reference cycles and
    # the jitted step bakes weights into cached executables — without the
    # collect+clear_caches the next cell OOMs on this cell's leftovers
    del pipe
    import gc
    gc.collect()
    jax.clear_caches()
    gc.collect()
    label = f"{'vsa' + str(vsa) if vsa else 'dense'}/remat={remat}"
    best = min(times)
    print(f"train step {label}: {best:.2f}s (all: "
          f"{[round(t, 2) for t in times]}, loss {m['loss']:.3f})",
          flush=True)
    return best


def main():
    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "benchmarks",
                           "train_step_1_3b.json")) as fh:
        cfg = json.load(fh)
    spec = cfg["train"]
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"

    headline = measure(spec["remat"], spec["vsa_sparsity"], spec,
                       steps=spec.get("steps", 3))
    ok = headline <= cfg["thresholds"]["step_s"]
    print(f"threshold step_s={cfg['thresholds']['step_s']}: "
          f"{'PASS' if ok else 'FAIL'} ({headline:.2f}s)", flush=True)
    if not quick:
        for remat, vsa in (("full", 0.0), ("ops", spec["vsa_sparsity"]),
                           ("none", spec["vsa_sparsity"])):
            try:
                measure(remat, vsa, spec, steps=2)
            except Exception as exc:  # OOM cells are data too
                print(f"train step {'vsa' if vsa else 'dense'}/"
                      f"remat={remat}: FAILED ({type(exc).__name__})",
                      flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
