"""Probe: SparseMLP sMLP-block fuse conv — concat(3C)->1x1 vs split matmuls.

The sMLPBlock (reference sparse_mlp.py:61-74) ends with
`cat([x_h, x_w, x], dim=1)` followed by a 1x1 conv 3C->C. The concat
materializes a 3C-channel tensor in HBM purely to feed a matmul whose
weight splits cleanly by source: W = [W_h | W_w | W_id], so
fuse(cat(a,b,c)) == a@W_h + b@W_w + c@W_id + bias. The split form never
writes the 3C tensor.

Usage: python tools/sparse_probe.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, x, iters=50):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(x))

    @jax.jit
    def loop(x, n):
        def body(i, c):
            return c * 0.999 + fn(c) * 0.001
        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    def t(k):
        s = time.perf_counter()
        float(loop(x, k))
        return time.perf_counter() - s

    t(1)
    a = t(1)
    b = t(iters + 1)
    return (b - a) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    print(f"b{batch} bf16, per-stage sMLP sub-block (proj_h/proj_w/fuse)")
    for d, hw in [(96, 56), (192, 28), (384, 14), (768, 7)]:
        x = jnp.asarray(rng.standard_normal((batch, hw, hw, d)),
                        jnp.bfloat16)
        wh = jnp.asarray(rng.standard_normal((hw, hw)) * 0.05, jnp.bfloat16)
        ww = jnp.asarray(rng.standard_normal((hw, hw)) * 0.05, jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal((3 * d, d)) * 0.05, jnp.bfloat16)
        bf = jnp.zeros((d,), jnp.bfloat16)

        def proj(y):
            x_h = jnp.moveaxis(jnp.moveaxis(y, 1, -1) @ wh.T, -1, 1)
            x_w = jnp.moveaxis(jnp.moveaxis(y, 2, -1) @ ww.T, -1, 2)
            return x_h, x_w

        def cat_fuse(y):
            x_h, x_w = proj(y)
            fused = jnp.concatenate([x_h, x_w, y], axis=-1)
            return fused @ wf + bf

        def split_fuse(y):
            x_h, x_w = proj(y)
            d_ = y.shape[-1]
            return (x_h @ wf[:d_] + x_w @ wf[d_:2 * d_]
                    + y @ wf[2 * d_:] + bf)

        a = timed(cat_fuse, x)
        b = timed(split_fuse, x)
        print(f"  d={d:4d} hw={hw:3d}: cat {a*1e3:7.3f} ms  "
              f"split {b*1e3:7.3f} ms  {a/b:5.2f}x")


if __name__ == "__main__":
    main()
