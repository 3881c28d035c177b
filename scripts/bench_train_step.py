"""On-chip 1.3B training-step ladder (VERDICT r4 weak #5).

Measures the REAL TrainingPipeline step (fwd+bwd+grad-clip+adamw through
the jitted scaffold, data via the prefetching StatefulDataLoader analog so
host decode overlaps the device step) across named cells from
benchmarks/train_step_1_3b.json:

  - full-SFT AdamW at 33k tokens (61f 480p)  — measured HBM limit: this
    does NOT fit one 16 GB chip (XLA memory assignment: 19.87G needed);
    recorded as an expected-OOM cell, the deployment answer is FSDP over
    dp (validated on the virtual mesh) or LoRA.
  - LoRA finetune at the full 33k tokens     — adapter-only optimizer
    state, frozen 1.3B base as hoisted constants; fits and is the
    single-chip finetuning product path.
  - full-SFT AdamW at a reduced token count  — largest dense cell probed
    to fit.
  - remat/attention ladder variants on the fitting SFT cell.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_step.py [cell ...]
With no args, runs every cell in the spec. OOM cells are data, not crashes.
"""
import json
import os
import re
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


def build_pipe(remat: str, vsa: float, method: str = "sft"):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
    from fastvideo_tpu.models.schedulers.flow_match_euler import (
        FlowMatchEulerDiscreteScheduler)
    from fastvideo_tpu.training.methods.lora import LoRATrainingPipeline
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
    if method == "lora":
        return LoRATrainingPipeline(model, sched, args, rank=32)
    return TrainingPipeline(model, sched, args)


def _free():
    # free for real between cells: nnx modules are reference cycles and
    # the jitted step bakes weights into cached executables — without the
    # collect+clear_caches the next cell OOMs on this cell's leftovers
    import gc
    gc.collect()
    jax.clear_caches()
    gc.collect()


def measure(name: str, cell: dict, steps: int = 3):
    label = (f"{name} [{cell.get('method', 'sft')}/"
             f"{'vsa' + str(cell['vsa_sparsity']) if cell['vsa_sparsity'] else 'dense'}"
             f"/remat={cell['remat']}]")
    pipe = None
    try:
        pipe = build_pipe(cell["remat"], cell["vsa_sparsity"],
                          cell.get("method", "sft"))
        loader = make_loader(tuple(cell["latents_shape"]), cell["text_len"],
                             DIT_CFG["text_dim"])
        it = iter(loader)
        s = cell["vsa_sparsity"] if cell["vsa_sparsity"] > 0 else None
        lat, emb = next(it)
        pipe.train_one_step(lat, emb, vsa_sparsity=s)  # compile
        times = []
        for _ in range(steps):
            lat, emb = next(it)
            t0 = time.perf_counter()
            m = pipe.train_one_step(lat, emb, vsa_sparsity=s)
            times.append(time.perf_counter() - t0)
        loader.shutdown()
        best = min(times)
        print(f"train step {label}: {best:.2f}s (all: "
              f"{[round(t, 2) for t in times]}, loss {m['loss']:.3f})",
              flush=True)
        return best
    except Exception as exc:  # OOM cells are data too
        msg = str(exc)
        hbm = re.search(r"Used ([0-9.]+[GM]) of ([0-9.]+[GM]) hbm", msg)
        detail = f" ({hbm.group(0)})" if hbm else ""
        print(f"train step {label}: FAILED {type(exc).__name__}{detail}",
              flush=True)
        return None
    finally:
        del pipe
        _free()


def main():
    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "benchmarks",
                           "train_step_1_3b.json")) as fh:
        cfg = json.load(fh)
    cells = cfg["cells"]
    names = sys.argv[1:] or list(cells)
    ok = True
    for name in names:
        cell = cells[name]
        best = measure(name, cell, steps=int(cell.get("steps", 3)))
        if cell.get("expect") == "oom":
            if best is not None:
                print(f"  NOTE: {name} expected OOM but ran — update the "
                      f"spec with a threshold", flush=True)
            continue
        thresh = cell.get("step_s")
        if best is None:
            ok = False
            print(f"  cell {name}: FAIL (did not run)", flush=True)
        elif thresh is not None:
            cell_ok = best <= thresh
            ok = ok and cell_ok
            print(f"  cell {name}: threshold step_s={thresh}: "
                  f"{'PASS' if cell_ok else 'FAIL'} ({best:.2f}s)",
                  flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
