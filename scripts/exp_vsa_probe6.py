"""Why does flash sustain 122 TF/s while identical-shape dot pairs probe at
~42? Compare: real flash at the sparse-equivalent workload (kv rows = 6720),
and probe variants that converge toward flash's exact structure."""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 128
H = 12
S = 32760


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=3):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def main():
    key = jax.random.PRNGKey(0)

    from fastvideo_tpu.ops.flash_attention import flash_attention

    # flash on the sparse-equivalent FLOP budget: every query attends to
    # 6720 kv rows (= topk*E). [B,S,H,D] layout for the public API.
    q = jax.random.normal(key, (1, S, H, D), jnp.bfloat16)
    kfull = jax.random.normal(key, (1, S, H, D), jnp.bfloat16)
    k6 = kfull[:, :6720]
    f = jax.jit(lambda q_, k_, v_: flash_attention(q_, k_, v_))
    t = timeit(f, q, k6, k6)
    tf = 4 * S * 6720 * D * H / 1e12
    print(f"flash kv=6720: {t:.1f} ms ({tf/t*1000:.0f} TF/s)", flush=True)
    t = timeit(f, q, kfull, kfull)
    tf = 4 * S * S * D * H / 1e12
    print(f"flash kv=full: {t:.1f} ms ({tf/t*1000:.0f} TF/s)", flush=True)

    # streaming probe: EXACT flash block structure (q 512 x kv 1024,
    # separate k/v operands, kj-streamed kv blocks), softmax optional.
    def kern(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, nkv,
             softmax):
        kj = pl.program_id(3)

        @pl.when(kj == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        q_ = q_ref[0, 0]
        k_ = k_ref[0, 0]
        v_ = v_ref[0, 0]
        s = jax.lax.dot_general(q_, k_, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if softmax:
            m_prev = m_ref[...]
            l_prev = l_ref[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[...] = m_next
            pv = jax.lax.dot(p.astype(v_.dtype), v_,
                             preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv
        else:
            pv = jax.lax.dot(s.astype(v_.dtype), v_,
                             preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] + pv

        @pl.when(kj == nkv - 1)
        def _s():
            o_ref[0, 0] = acc_ref[...].astype(o_ref.dtype)

    def stream(qb, kb, vb, bq, bkv, softmax):
        b, h, s, d = qb.shape
        skv = kb.shape[2]
        nq = s // bq
        nkv = skv // bkv
        return pl.pallas_call(
            functools.partial(kern, nkv=nkv, softmax=softmax),
            out_shape=jax.ShapeDtypeStruct(qb.shape, qb.dtype),
            grid=(b, h, nq, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, kj: (b_, h_,
                                                                    qi, 0)),
                pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, qi, kj: (b_, h_,
                                                                     kj, 0)),
                pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, qi, kj: (b_, h_,
                                                                     kj, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, d),
                                   lambda b_, h_, qi, kj: (b_, h_, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
        )(qb, kb, vb)

    qb = jax.random.normal(key, (1, H, S - S % 512, D), jnp.bfloat16)
    kb = jax.random.normal(key, (1, H, 6656, D), jnp.bfloat16)
    for bq, bkv, sm in [(512, 1024, True), (512, 1024, False),
                        (840, 1664, False), (512, 256, False),
                        (840, 280, False)]:
        sq = qb.shape[2] - qb.shape[2] % bq
        skv = kb.shape[2] - kb.shape[2] % bkv
        try:
            fn = jax.jit(lambda q_, k_, bq=bq, bkv=bkv, sm=sm, sq=sq,
                         skv=skv: stream(q_[:, :, :sq], k_[:, :, :skv],
                                         k_[:, :, :skv], bq, bkv, sm))
            t = timeit(fn, qb, kb)
            tf = 4 * H * sq * skv * D / 1e12
            print(f"stream bq={bq} bkv={bkv} sm={int(sm)}: {t:.1f} ms "
                  f"({tf/t*1000:.0f} TF/s)", flush=True)
        except Exception as e:
            print(f"stream bq={bq} bkv={bkv}: FAIL {type(e).__name__} "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
