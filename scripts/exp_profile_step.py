"""Op-level profile of the full 1.3B VSA denoise step (bf16 or int8).

Traces one jitted step with jax.profiler and parses the xplane with
tensorboard_plugin_profile's hlo_stats converter to print the top-K HLO
ops by self time. Answers directly where the 1.36 s step goes and what
changes when the linears are int8 (FASTVIDEO_TRANSFORMER_QUANT=int8).
"""
import glob
import os
import sys
import time

os.environ.setdefault("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.attention.backends.abstract import AttentionMetadata
from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
from fastvideo_tpu.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    quant = sys.argv[1] if len(sys.argv) > 1 else ""
    key = jax.random.PRNGKey(0)
    cfg = WanArchConfig(num_attention_heads=12, attention_head_dim=128,
                        in_channels=16, out_channels=16, text_dim=4096,
                        freq_dim=256, ffn_dim=8960, num_layers=30)
    dit = WanTransformer3DModel(cfg, param_dtype=jnp.bfloat16,
                                rngs=nnx.Rngs(0))
    if quant:
        from fastvideo_tpu.layers.quantization import (QuantizationConfig,
                                                       quantize_model_linears)
        n = quantize_model_linears(dit, QuantizationConfig(method=quant))
        print(f"quantized {n} linears ({quant})", flush=True)
    lat = jax.random.normal(key, (1, 16, 21, 60, 104), jnp.bfloat16)
    ctx = jax.random.normal(key, (1, 512, 4096), jnp.bfloat16)
    md = AttentionMetadata(extra={"VSA_sparsity": 0.8})
    gd, st = nnx.split(dit)

    @jax.jit
    def step(st, lat, ctx):
        m = nnx.merge(gd, st)
        t_arr = jnp.full((1,), 757.0, jnp.float32)
        with set_forward_context(attn_metadata=md):
            return m(lat, ctx, t_arr)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    sync(step(st, lat, ctx))  # compile
    t0 = time.perf_counter()
    sync(step(st, lat, ctx))
    print(f"step: {(time.perf_counter() - t0) * 1000:.0f} ms", flush=True)

    logdir = f"/tmp/prof_step_{quant or 'bf16'}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        sync(step(st, lat, ctx))

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        print("NO TRACE CAPTURED (axon tunnel may not support device trace)")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    for tool in ("hlo_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool, {})
            out = f"{logdir}/{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"wrote {out} ({len(data)} bytes)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tool} failed: {e}", flush=True)


if __name__ == "__main__":
    main()
