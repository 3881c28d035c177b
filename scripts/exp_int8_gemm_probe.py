"""Probe: does XLA's int8 dot_general hit int8 MXU rates on this chip?

Measures, at Wan-1.3B production GEMM shapes, chained-matmul throughput of
(a) bf16 x bf16, (b) int8 x int8 -> int32 (pre-quantized), (c) the full
W8A8 path (dynamic per-token activation quant + dequant) as Int8Linear
runs it, (d) W8A8 with the quant math in bf16. The chain runs REPS
dependent iterations inside one jitted fori_loop so async-dispatch timing
artifacts can't flatter the number.
"""
import time

import jax
import jax.numpy as jnp

from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()

M = 32760  # tokens per denoise step (Wan 1.3B, 61 frames 480p, t=21 s=1560)
REPS = 32
SHAPES = [
    (M, 1536, 1536),   # qkv/out proj
    (M, 1536, 8960),   # ffn in
    (M, 8960, 1536),   # ffn out
]


def bench(make_step, x0, n=3):
    """make_step(carry, i) -> carry, chained REPS times under one jit."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, REPS, lambda i, c: make_step(c, i), x)

    def sync(o):
        # block_until_ready is a NO-OP on the axon relay; only a host
        # fetch really syncs (see .claude/skills/verify).
        return float(jnp.sum(o.astype(jnp.float32)))

    sync(run(x0))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(run(x0))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main():
    key = jax.random.PRNGKey(0)
    for (m, k, n) in SHAPES:
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (m, k), jnp.bfloat16)
        w = jax.random.normal(kw, (k, n), jnp.bfloat16) * 0.02
        wq8 = jnp.clip(jnp.round(w.astype(jnp.float32) * 500), -127,
                       127).astype(jnp.int8)
        sw = jnp.full((n,), 1.0 / 500 / 500, jnp.float32)
        flops = 2 * m * k * n

        # carry is [m, k]; each step produces [m, n] then projects back to
        # [m, k] via slicing/padding so the chain stays data-dependent.
        def back(y, shape=(m, k)):
            y = y.astype(jnp.bfloat16)
            if y.shape[1] >= shape[1]:
                return y[:, :shape[1]]
            reps = -(-shape[1] // y.shape[1])
            return jnp.tile(y, (1, reps))[:, :shape[1]]

        def s_bf16(c, i):
            return back(jnp.dot(c, w))

        def s_int8(c, i):
            cq = c.astype(jnp.int8)  # cheap fake quant: keeps chain honest
            acc = jax.lax.dot_general(cq, wq8, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return back(acc)

        def s_w8a8(c, i):
            amax = jnp.max(jnp.abs(c.astype(jnp.float32)), axis=-1,
                           keepdims=True)
            sx = jnp.maximum(amax / 127.0, 1e-8)
            cq = jnp.clip(jnp.round(c.astype(jnp.float32) / sx), -127,
                          127).astype(jnp.int8)
            acc = jax.lax.dot_general(cq, wq8, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return back(acc.astype(jnp.float32) * sx * sw)

        def s_w8a8_b(c, i):
            amax = jnp.max(jnp.abs(c), axis=-1, keepdims=True)
            sx = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-8)
            cq = jnp.clip(jnp.round(c * (1.0 / sx).astype(jnp.bfloat16)),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(cq, wq8, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return back(acc.astype(jnp.float32) * sx * sw)

        for name, step in (("bf16      ", s_bf16), ("int8 pure ", s_int8),
                           ("w8a8 fp32q", s_w8a8), ("w8a8 bf16q", s_w8a8_b)):
            dt = bench(step, x)
            print(f"[{m}x{k}x{n}] {name}: {dt*1e3:7.3f} ms  "
                  f"{flops/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
