"""Probe: WaveMLP tfc grouped conv (2C->C, groups=C, (1,7)) — XLA grouped
lowering vs decomposition into two full-C depthwise convs.

torch group semantics (reference wave_mlp.py:30-33): group g consumes input
channels [2g, 2g+1] -> out g. Decomposition: even-indexed channels through
depthwise kernel w[:, 0], odd-indexed through w[:, 1], summed. A group of 2
in-channels runs at 2/128 lane utilization in the grouped lowering; the
measurements behind models/wave_mlp.py::_tfc (b32 bf16, one v5e):

  C= 64 HW=56: grouped 1.136 ms  decomposed 0.229 ms  4.97x
  C=128 HW=28: grouped 0.311 ms  decomposed 0.138 ms  2.24x
  C=320 HW=14: grouped 0.312 ms  decomposed 0.093 ms  3.37x
  C=512 HW= 7: grouped 0.116 ms  decomposed 0.137 ms  0.84x  <- keeps grouped

Usage: python tools/wave_probe.py [batch]
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    # scalar-fetch protocol
    @jax.jit
    def loop(x, n):
        def body(i, c):
            y = fn(c)
            if y.shape != c.shape:
                y = jnp.concatenate([y, y], axis=-1)
            return c * 0.999 + y.astype(c.dtype) * 0.001
        return jnp.sum(lax.fori_loop(0, n, body, x).astype(jnp.float32))

    def t(k):
        s = time.perf_counter()
        float(loop(args[0], k))
        return time.perf_counter() - s

    t(1)
    a = t(1)
    b = t(iters + 1)
    return (b - a) / iters


def grouped(x, w):
    # x: (B,H,W,2C), w: (C, 2, 1, 7) torch OIHW
    C = w.shape[0]
    wk = jnp.transpose(w, (2, 3, 1, 0))  # HWIO
    return lax.conv_general_dilated(
        x, wk, (1, 1), [(0, 0), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def decomposed(x, w):
    # even/odd channel split -> two depthwise convs
    C = w.shape[0]
    B, H, W, _ = x.shape
    xp = x.reshape(B, H, W, C, 2)
    xe, xo = xp[..., 0], xp[..., 1]
    we = jnp.transpose(w[:, 0:1], (2, 3, 1, 0))  # (1,7,1,C)
    wo = jnp.transpose(w[:, 1:2], (2, 3, 1, 0))
    dn = ("NHWC", "HWIO", "NHWC")
    ye = lax.conv_general_dilated(xe, we, (1, 1), [(0, 0), (3, 3)],
                                  dimension_numbers=dn, feature_group_count=C)
    yo = lax.conv_general_dilated(xo, wo, (1, 1), [(0, 0), (3, 3)],
                                  dimension_numbers=dn, feature_group_count=C)
    return ye + yo


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.RandomState(0)
    print(f"batch {B}, bf16")
    for C, HW in [(64, 56), (128, 28), (320, 14), (512, 7)]:
        x = jnp.asarray(rng.randn(B, HW, HW, 2 * C), jnp.bfloat16)
        w = jnp.asarray(rng.randn(C, 2, 1, 7) * 0.05, jnp.bfloat16)

        g = jax.jit(lambda x: grouped(x, w))
        d = jax.jit(lambda x: decomposed(x, w))
        # parity
        a = np.asarray(g(x).astype(jnp.float32))
        bv = np.asarray(d(x).astype(jnp.float32))
        err = np.abs(a - bv).max()
        tg = timed(g, x) * 1e3
        td = timed(d, x) * 1e3
        print(f"C={C:4d} HW={HW:3d}: grouped {tg:7.3f} ms  decomposed {td:7.3f} ms  "
              f"speedup {tg/td:5.2f}x  maxabs {err:.2e}")

        # backward comparison
        gg = jax.jit(jax.grad(lambda x: jnp.sum(grouped(x, w).astype(jnp.float32))))
        gd = jax.jit(jax.grad(lambda x: jnp.sum(decomposed(x, w).astype(jnp.float32))))
        tgg = timed(gg, x) * 1e3
        tgd = timed(gd, x) * 1e3
        print(f"           bwd: grouped {tgg:7.3f} ms  decomposed {tgd:7.3f} ms  speedup {tgg/tgd:5.2f}x")


if __name__ == "__main__":
    main()
