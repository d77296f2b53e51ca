"""Probe: ViP SplitAttention — stacked (B,k,H,W,C) gating vs unstacked.

split_attention (reference vip.py:37-57) stacks the three mixer branches
into (B, 3, H, W, C) to (a) sum them for the gate MLP input and (b) apply
the softmax gate. The stack materializes 3x the activation in HBM purely
for bookkeeping: the gate input is just b1+b2+b3 summed over (H,W), and the
gated output is bar1*b1 + bar2*b2 + bar3*b3 — both expressible on the
unstacked branches.

Usage: python tools/vip_probe.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=50):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))

    @jax.jit
    def loop(a, n):
        def body(i, c):
            y = fn(c, *a[1:])
            return c * 0.999 + y * 0.001
        return jnp.sum(jax.lax.fori_loop(0, n, body, a[0]).astype(jnp.float32))

    def t(k):
        s = time.perf_counter()
        float(loop(args, k))
        return time.perf_counter() - s

    t(1)
    a = t(1)
    b = t(iters + 1)
    return (b - a) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H = W = 14
    C = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, H, W, C)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.bfloat16)
    # stand-in branches: three cheap distinct transforms of x
    def branches(y):
        return y, y * 1.5, y + 0.5

    def gate(a):
        h = jnp.maximum(a @ w1, 0)
        return (h @ w2).reshape(a.shape[0], 3, C)

    def stacked(y):
        b1, b2, b3 = branches(y)
        x_all = jnp.stack([b1, b2, b3], 1)  # (B,3,H,W,C)
        B = x_all.shape[0]
        xf = x_all.reshape(B, 3, H * W, C)
        a = jnp.sum(xf, axis=(1, 2))
        bar = jax.nn.softmax(gate(a), axis=1)
        out = jnp.sum(bar[:, :, None, :] * xf, axis=1)
        return out.reshape(B, H, W, C)

    def unstacked(y):
        b1, b2, b3 = branches(y)
        a = jnp.sum(b1 + b2 + b3, axis=(1, 2))
        bar = jax.nn.softmax(gate(a), axis=1)
        g = bar[:, :, None, None, :]
        return b1 * g[:, 0] + b2 * g[:, 1] + b3 * g[:, 2]

    sa = timed(stacked, (x,))
    sb = timed(unstacked, (x,))
    d = float(jnp.max(jnp.abs(jax.jit(stacked)(x).astype(jnp.float32)
                              - jax.jit(unstacked)(x).astype(jnp.float32))))
    print(f"b{batch} H=W={H} C={C}: stacked {sa*1e3:6.3f} ms  "
          f"unstacked {sb*1e3:6.3f} ms  {sa/sb:5.2f}x  (max|diff| {d:.2e})")


if __name__ == "__main__":
    main()
