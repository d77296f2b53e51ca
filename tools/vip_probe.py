"""Probe: ViP SplitAttention — stacked (B,k,H,W,C) gating vs unstacked.

split_attention (reference vip.py:37-57) stacks the three mixer branches
into (B, 3, H, W, C) to (a) sum them for the gate MLP input and (b) apply
the softmax gate. The stack materializes 3x the activation in HBM purely
for bookkeeping: the gate input is just b1+b2+b3 summed over (H,W), and the
gated output is bar1*b1 + bar2*b2 + bar3*b3 — both expressible on the
unstacked branches (the form models/vip.py now ships).

The probe measures one FULL WeightedPermutator mixer (real _mix_h/_mix_w
segment-permute einsums + channel linear from the built model's params, at
the driver config geometry) under both gating forms, so the printed ratio
is the honest per-block delta, not a stand-in-branch exaggeration.

Usage: python tools/vip_probe.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu.core import nnf
    from jittor_mlp_tpu.models.vip import _mix_h, _mix_w

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    segments = 16
    model = jm.ViP(d_model=256, depth=1, segments=segments, weighted=True)
    bp = jax.tree.map(
        lambda l: l[0].astype(jnp.bfloat16) if l.ndim else l,
        model.params["blocks"],
    )
    t = bp["0"]
    fns = t["fn"]["0"]["fns"]
    sa_p = t["fn"]["0"]["split_attention"]
    H = W = 14
    C = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, H, W, C)), jnp.bfloat16)

    def branches(y):
        b1 = _mix_h(fns["0"]["1"], y, segments)
        b2 = _mix_w(fns["1"]["1"], y, segments)
        b3 = nnf.linear(fns["2"], y)
        return b1, b2, b3

    def gate(a):
        return nnf.linear(sa_p["mlp2"], nnf.gelu(nnf.linear(sa_p["mlp1"], a)))

    def stacked(y):
        b1, b2, b3 = branches(y)
        x_all = jnp.stack([b1, b2, b3], 1)  # (B,3,H,W,C)
        B = x_all.shape[0]
        xf = x_all.reshape(B, 3, H * W, C)
        a = jnp.sum(xf, axis=(1, 2))
        bar = jax.nn.softmax(gate(a).reshape(B, 3, C), axis=1)
        out = jnp.sum(bar[:, :, None, :] * xf, axis=1)
        return out.reshape(B, H, W, C)

    def unstacked(y):
        b1, b2, b3 = branches(y)
        B = y.shape[0]
        a = jnp.sum(b1 + b2 + b3, axis=(1, 2))
        bar = jax.nn.softmax(gate(a).reshape(B, 3, C), axis=1)
        g = bar[:, :, None, None, :]
        return b1 * g[:, 0] + b2 * g[:, 1] + b3 * g[:, 2]

    sa = timed(stacked, (x,))
    sb = timed(unstacked, (x,))
    d = float(jnp.max(jnp.abs(jax.jit(stacked)(x).astype(jnp.float32)
                              - jax.jit(unstacked)(x).astype(jnp.float32))))
    print(f"b{batch} H=W={H} C={C} (real mixer branches): "
          f"stacked {sa*1e3:6.3f} ms  "
          f"unstacked {sb*1e3:6.3f} ms  {sa/sb:5.2f}x  (max|diff| {d:.2e})")


if __name__ == "__main__":
    main()
