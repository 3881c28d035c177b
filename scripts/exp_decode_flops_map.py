"""Static accounting: trace one production decode and log every CausalConv3d
call — shape, selected path, FLOPs — to see where the decode FLOP budget
actually sits (and how much the int8-eligible stages cover).

Runs on CPU (trace only, no execution needed beyond jit lowering).
"""
import collections
import os
import sys

os.environ.setdefault("FASTVIDEO_VAE_CONV3D", sys.argv[1] if len(sys.argv) > 1
                      else "auto_int8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
from fastvideo_tpu.models.vaes import wan as wan_vae

calls = []
orig = wan_vae.CausalConv3d.__call__


def patched(self, x, *, time_pad=None, ctx=None, gamma=None):
    from fastvideo_tpu.ops import conv3d as conv3d_ops

    pt, ph, pw = self.pad
    tp = 2 * pt if time_pad is None else time_pad
    t_eff = x.shape[1] + (0 if ctx is None or ctx.entries is None else 2 * pt)
    kt = self.kernel_size[0]
    cin, cout = x.shape[-1], self.weight.value.shape[-1]
    mode = wan_vae._vae_conv3d_mode()
    sup = bool(mode) and conv3d_ops.supports(
        self.kernel_size, self.stride, (tp, ph, pw), cin, cout,
        w_dim=x.shape[3], mode=mode, h_dim=x.shape[2])
    path = "xla"
    if sup:
        path = mode
        if mode == "auto_int8":
            int8_ok = (cin % 32 == 0 and cout % 32 == 0 and cin >= 64
                       and x.shape[3] >= 256)
            path = "int8" if int8_ok else (
                "kf" if cin >= 64 and x.shape[3] >= 256 else "tap")
        elif mode == "auto":
            path = "kf" if cin >= 64 and x.shape[3] >= 256 else "tap"
    t_out = x.shape[1]
    flops = (2 * t_out * x.shape[2] * x.shape[3] * cin * cout *
             kt * self.kernel_size[1] * self.kernel_size[2])
    calls.append((path, cin, cout, x.shape[1], x.shape[2], x.shape[3], flops))
    return orig(self, x, time_pad=time_pad, ctx=ctx, gamma=gamma)


wan_vae.CausalConv3d.__call__ = patched


def main():
    vae = wan_vae.AutoencoderKLWan(WanVAEArchConfig(), load_encoder=False,
                                   param_dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
    z = jnp.zeros((1, 16, 21, 60, 104), jnp.float32)
    jax.eval_shape(lambda z: vae.decode(z.astype(jnp.bfloat16)), z)

    # decode_dispatched chunks: the trace sees one chunk of each distinct
    # shape; scale by how many chunks of that shape run. Instead just
    # aggregate the traced calls (chunk scans trace the body once but run
    # it N times — count that via the latent T split).
    agg = collections.defaultdict(lambda: [0, 0.0])
    for path, cin, cout, t, h, w, fl in calls:
        key = (path, cin, cout, h, w)
        agg[key][0] += 1
        agg[key][1] += fl
    total = sum(v[1] for v in agg.values())
    print(f"{'path':>6} {'cin':>4} {'cout':>4} {'H':>4} {'W':>4} "
          f"{'calls':>5} {'GFLOP':>9} {'share':>6}")
    for key, (n, fl) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        path, cin, cout, h, w = key
        print(f"{path:>6} {cin:>4} {cout:>4} {h:>4} {w:>4} {n:>5} "
              f"{fl/1e9:>9.1f} {fl/total*100:>5.1f}%")
    by_path = collections.defaultdict(float)
    for key, (n, fl) in agg.items():
        by_path[key[0]] += fl
    print(f"\ntotal traced conv GFLOPs: {total/1e9:.1f}")
    for p, fl in sorted(by_path.items(), key=lambda kv: -kv[1]):
        print(f"  {p}: {fl/1e9:.1f} GFLOP ({fl/total*100:.1f}%)")


if __name__ == "__main__":
    main()
