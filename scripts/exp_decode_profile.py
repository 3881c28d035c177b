"""Per-submodule decode time budget on chip: time each decoder stage
(conv_in+mid, up0, up1, up2, norm+conv_out) as separate jits at the
production chunk shapes, next to a 1.3B ballast. Also tries
jax.profiler.trace around a full warm chunk for op-level data.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
from fastvideo_tpu.models.vaes import wan as wan_vae
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()

os.environ.setdefault("FASTVIDEO_VAE_CONV3D", "auto")


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    vae = wan_vae.AutoencoderKLWan(WanVAEArchConfig(), load_encoder=False,
                                   param_dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
    dec = vae.decoder
    n_chunks = 10  # 21 latent frames -> 1 + 10x2 at chunk=2
    key = jax.random.PRNGKey(0)

    # stage inputs at the steady-state chunk shape (2 latent frames,
    # caches warm): conv_in/mid at [1,2,60,104,*], up0 in 384, up1 in 192,
    # up2 in 96. Build them by running one real chunk and capturing
    # intermediates — simplest: re-run the real stages with a ctx whose
    # cache comes from a first-frame pass.
    graphdef, st = nnx.split(vae)

    @jax.jit
    def first_pass(st, z):
        m = nnx.merge(graphdef, st)
        x = m.post_quant_conv(z)
        ctx = wan_vae.StreamCache(None)
        out = m.decoder(x, first_len=1, ctx=ctx)
        return out, ctx.out

    z1 = jax.random.normal(key, (1, 1, 60, 104, 16), jnp.bfloat16)
    _, cache = first_pass(st, z1)
    sync(cache[0])

    # stage-sliced jits over one steady chunk
    def make_stage(fn):
        @jax.jit
        def run(st, x, cache):
            m = nnx.merge(graphdef, st)
            ctx = wan_vae.StreamCache(cache)
            out = fn(m, x, ctx)
            return out, ctx.out
        return run

    def s_convin_mid(m, x, ctx):
        x = m.post_quant_conv(x)
        x = m.decoder.conv_in(x, ctx=ctx)
        return m.decoder.mid_block(x, ctx)

    def s_up(i):
        def f(m, x, ctx):
            return m.decoder.up_blocks[i](x, first_len=0, ctx=ctx)
        return f

    def s_out(m, x, ctx):
        x = jax.nn.silu(m.decoder.norm_out(x))
        return m.decoder.conv_out(x, ctx=ctx)

    zc = jax.random.normal(key, (1, 2, 60, 104, 16), jnp.bfloat16)

    # walk the real chunk once to capture stage inputs AND per-stage cache
    # slices. StreamCache entries are consumed in call order, so split the
    # warm cache by how many entries each stage consumes.
    stage_fns = [("conv_in+mid", s_convin_mid)]
    for i in range(len(dec.up_blocks)):
        stage_fns.append((f"up{i}", s_up(i)))
    stage_fns.append(("norm+conv_out", s_out))

    # count cache entries per stage by tracing with a counting ctx
    class CountCtx(wan_vae.StreamCache):
        def __init__(self):
            super().__init__(None)
            self.count = 0

        def pop(self):
            self.count += 1
            self.idx += 1
            return None

        def push(self, e):
            pass

    counts = []
    x_shapes = []
    x = jax.eval_shape(lambda z: vae.post_quant_conv(z), zc)
    cur = zc
    total = time.perf_counter()
    inputs = []
    cache_slices = []
    ci = 0
    m = vae
    cur = zc
    for name, fn in stage_fns:
        cctx = CountCtx()
        if name == "conv_in+mid":
            probe = lambda xx, c: s_convin_mid(m, xx, c)
        elif name.startswith("up"):
            probe = (lambda i: lambda xx, c: m.decoder.up_blocks[i](
                xx, first_len=0, ctx=c))(int(name[2:]))
        else:
            probe = lambda xx, c: s_out(m, xx, c)
        inputs.append(cur)
        out = probe(cur, cctx)
        counts.append(cctx.count)
        cache_slices.append(cache[ci:ci + cctx.count])
        ci += cctx.count
        cur = out
        print(f"{name}: in {inputs[-1].shape} out {out.shape} "
              f"cache_entries {cctx.count}", flush=True)

    total_t = 0.0
    for (name, fn), xin, csl in zip(stage_fns, inputs, cache_slices):
        run = make_stage(fn)
        t = timeit(run, st, xin, csl)
        total_t += t
        print(f"{name}: {t*1000:.1f} ms/chunk x{n_chunks} = "
              f"{t*n_chunks:.2f} s", flush=True)
    print(f"stage-sum: {total_t*n_chunks:.2f} s over {n_chunks} chunks "
          f"(+ first-frame chunk)", flush=True)

    if "--profile" in sys.argv:
        import jax.profiler as prof
        z2 = jax.random.normal(key, (1, 16, 21, 60, 104), jnp.float32)
        sync(vae.decode_dispatched(z2, denormalize=True,
                                   decode_dtype=jnp.bfloat16))
        with prof.trace("/tmp/jax_decode_trace"):
            sync(vae.decode_dispatched(z2, denormalize=True,
                                       decode_dtype=jnp.bfloat16))
        print("trace written to /tmp/jax_decode_trace", flush=True)


if __name__ == "__main__":
    main()
