"""Measure the dynamic-W8A8 vs bf16 matmul ratio as a function of width.

One number explains the zoo-wide int8 table (PARITY_BF16.md): the dynamic
path adds VPU/HBM passes that do not shrink with D (per-token absmax,
round/cast to int8, int32→f32 rescale), while the MXU contraction itself
runs at 2× the bf16 rate. The crossover is where the contraction is wide
enough that halving it pays for the fixed pointwise work. This prints the
measured img-equivalent ratio for a (T, D) @ (D, D) matmul chain across the
zoo's channel widths, on the current device.

Usage: python tools/int8_matmul_curve.py [tokens]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jittor_mlp_tpu.quant import dynamic_int8_matmul


def timed(fn, args, iters=2000):
    # these matmuls are 3–60 µs each: t(N)−t(1) needs N in the thousands
    # before the delta clears dispatch noise (docs/PERFORMANCE.md "Protocol
    # pitfalls")
    @jax.jit
    def loop(a, n):
        def body(i, c):
            return c * 0.999 + fn(c, *a[1:]) * 0.001
        return jnp.sum(jax.lax.fori_loop(0, n, body, a[0]).astype(jnp.float32))

    float(loop(args, 1))

    def t(k):
        s = time.perf_counter()
        float(loop(args, k))
        return time.perf_counter() - s

    t(1)
    return (t(iters + 1) - t(1)) / iters


def main():
    tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 64 * 196
    rng = np.random.default_rng(0)
    print(f"tokens={tokens} ({jax.devices()[0].platform})")
    print(f"{'D':>6} {'bf16 ms':>9} {'int8 ms':>9} {'int8/bf16':>10}")
    for D in (64, 96, 128, 192, 256, 384, 512, 768, 1024):
        x = jnp.asarray(rng.standard_normal((tokens, D)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((D, D)) * 0.05, jnp.bfloat16)

        def mm(x, w):
            return jnp.matmul(x, w)

        def qmm(x, w):
            return dynamic_int8_matmul(x, w)

        tb = timed(mm, (x, w))
        tq = timed(qmm, (x, w))
        print(f"{D:>6} {tb*1e3:>9.3f} {tq*1e3:>9.3f} {tb/tq:>9.2f}x")


if __name__ == "__main__":
    main()
