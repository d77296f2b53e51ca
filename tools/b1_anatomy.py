"""Probe: batch-1 forward anatomy for the worst b1→b64 families.

LATENCY.md shows wave_mlp serving b1 at 531 img/s vs 4,394 at b64 (8.3×
left on the table) and vip at 770 vs 5,047 (6.6×). This probe times the
individual ops of one block at the real driver-config geometry
(compare.py CONFIGS) at small batch, so the b1 fix targets the measured
bottleneck rather than the assumed one.

Components probed:
  wave_mlp — per stage geometry: the PATM 1×1 convs, the grouped
    token-fuse convs (`_tfc`, torch Conv2d(2C→C,(1,7),groups=C) —
    reference wave_mlp.py:29-33) under three lowerings: XLA grouped
    conv, the shipped even/odd depthwise split, and a shift-and-FMA
    form (7 static slices × per-channel weight, pure VPU elementwise).
  vip — the three mixer branches (reference vip.py:16-27) separate vs
    the h/w pair folded into ONE batched einsum (H==W so the two
    segment-permute contractions share a shape; stack weights on a
    group axis), plus split_attention and the channel FF.

Usage: python tools/b1_anatomy.py [wave|vip] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=400, feedback=None):
    """Device-loop timing (no per-call dispatch): fori_loop carries the
    input, each step folds a pinch of the output back in (feedback maps
    output→input shape; default assumes same shape)."""
    fb = feedback or (lambda y, c: y)
    jax.block_until_ready(jax.jit(fn)(*args))

    @jax.jit
    def loop(a, n):
        def body(i, c):
            y = fn(c, *a[1:])
            return c * 0.999 + fb(y, c).astype(c.dtype) * 0.001
        return jnp.sum(jax.lax.fori_loop(0, n, body, a[0]).astype(jnp.float32))

    def t(k):
        s = time.perf_counter()
        float(loop(args, k))
        return time.perf_counter() - s

    t(1)
    a = min(t(1) for _ in range(3))
    b = min(t(iters + 1) for _ in range(3))
    return (b - a) / iters


def probe_wave(batch):
    from jittor_mlp_tpu.core import nnf

    rng = np.random.default_rng(0)
    # WaveMLP-T stage geometries (embed_dims × resolutions after stem/downs)
    for (H, C) in [(56, 64), (28, 128), (14, 320), (7, 512)]:
        W = H
        x2 = jnp.asarray(rng.standard_normal((batch, H, W, 2 * C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((C, 2, 1, 7)), jnp.bfloat16)
        p = {"weight": w}

        def grouped(x2):
            return nnf.conv2d(p, x2, padding=(0, 3), groups=C)

        def evenodd(x2):
            xp = x2.reshape(batch, H, W, C, 2)
            ye = nnf.conv2d({"weight": w[:, 0:1]}, xp[..., 0],
                            padding=(0, 3), groups=C)
            yo = nnf.conv2d({"weight": w[:, 1:2]}, xp[..., 1],
                            padding=(0, 3), groups=C)
            return ye + yo

        def shift_fma(x2):
            # y[b,h,w,c] = Σ_k Σ_s x2r[b,h,w+k-3,c,s]·w[c,s,k]
            x5 = x2.reshape(batch, H, W, C, 2)
            xp = jnp.pad(x5, ((0, 0), (0, 0), (3, 3), (0, 0), (0, 0)))
            wk = jnp.transpose(w[:, :, 0, :], (2, 0, 1))  # (7, C, 2)
            y = jnp.zeros((batch, H, W, C), x2.dtype)
            for k in range(7):
                y = y + jnp.sum(xp[:, :, k:k + W] * wk[k], axis=-1)
            return y

        fb2 = lambda y, c: jnp.concatenate([y, y], axis=-1)  # noqa: E731
        tg = timed(grouped, x2, feedback=fb2)
        te = timed(evenodd, x2, feedback=fb2)
        ts = timed(shift_fma, x2, feedback=fb2)
        d = float(jnp.max(jnp.abs(
            jax.jit(evenodd)(x2).astype(jnp.float32)
            - jax.jit(shift_fma)(x2).astype(jnp.float32))))
        # the surrounding PATM matmul for scale
        wq = jnp.asarray(rng.standard_normal((C, C, 1, 1)), jnp.bfloat16)
        x1 = x2[..., :C]
        tq = timed(lambda a: nnf.conv1x1({"weight": wq}, a), x1)
        print(f"b{batch} {H}x{W}x{C}: tfc grouped {tg*1e6:7.1f}us  "
              f"even/odd {te*1e6:7.1f}us  shift-fma {ts*1e6:7.1f}us  "
              f"(1x1 conv {tq*1e6:6.1f}us)  max|d| {d:.1e}")


def probe_vip(batch):
    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu.core import nnf
    from jittor_mlp_tpu.models.vip import _mix_h, _mix_w, split_attention

    segments = 16
    model = jm.ViP(patch_size=14, d_model=256, depth=1, segments=segments,
                   weighted=True)  # driver config: 224²/14 → H=W=16
    bp = jax.tree.map(
        lambda l: l[0].astype(jnp.bfloat16) if l.ndim else l,
        model.params["blocks"],
    )
    t = bp["0"]
    fns = t["fn"]["0"]["fns"]
    sa_p = t["fn"]["0"]["split_attention"]
    H = W = 16
    C = 256
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((batch, H, W, C)), jnp.bfloat16)

    def separate(y):
        b1 = _mix_h(fns["0"]["1"], y, segments)
        b2 = _mix_w(fns["1"]["1"], y, segments)
        return b1, b2

    s = segments
    cs = C // s
    w_h = fns["0"]["1"]["weight"].reshape(H, s, H, s)
    w_w = fns["1"]["1"]["weight"].reshape(W, s, W, s)
    w_g = jnp.stack([w_h, w_w])  # (2, k, l, h, s)
    bias_g = jnp.stack([fns["0"]["1"]["bias"].reshape(H, s),
                        fns["1"]["1"]["bias"].reshape(W, s)])

    def fused_hw(y):
        x5 = y.reshape(batch, H, W, cs, s)
        x5t = jnp.swapaxes(x5, 1, 2)
        xg = jnp.stack([x5, x5t])  # (2, B, H, W, cs, s)
        yg = jnp.einsum("gbhwcs,gklhs->gbkwcl", xg, w_g,
                        precision=nnf._prec())
        yg = yg + bias_g[:, None, :, None, None, :]  # (g,1,k,1,1,l)
        b1 = yg[0].reshape(batch, H, W, C)
        b2 = jnp.swapaxes(yg[1], 1, 2).reshape(batch, H, W, C)
        return b1, b2

    fbp = lambda y, c: y[0] + y[1]  # noqa: E731
    ts = timed(separate, y, feedback=fbp)
    tf = timed(fused_hw, y, feedback=fbp)
    r1, r2 = jax.jit(separate)(y)
    f1, f2 = jax.jit(fused_hw)(y)
    d = max(float(jnp.max(jnp.abs(r1.astype(jnp.float32) - f1.astype(jnp.float32)))),
            float(jnp.max(jnp.abs(r2.astype(jnp.float32) - f2.astype(jnp.float32)))))

    b3w = fns["2"]
    tb3 = timed(lambda a: nnf.linear(b3w, a), y)
    b1, b2 = jax.jit(separate)(y)
    b3 = jax.jit(lambda a: nnf.linear(b3w, a))(y)
    tsa = timed(lambda a, b, c: split_attention(sa_p, [a, b, c]), b1, b2, b3)
    tproj = timed(lambda a: nnf.linear(t["fn"]["1"], a), y)
    c = bp["1"]
    cft = timed(
        lambda a: nnf.linear(c["fn"]["3"],
                             nnf.gelu(nnf.linear(c["fn"]["0"], a))), y)
    tln = timed(lambda a: nnf.layer_norm(t["norm"], a), y)
    print(f"b{batch} {H}x{W}x{C} seg{segments}:")
    print(f"  mix_h+mix_w separate {ts*1e6:7.1f}us   fused-einsum "
          f"{tf*1e6:7.1f}us   max|d| {d:.1e}")
    print(f"  b3 linear {tb3*1e6:7.1f}us   split_attention {tsa*1e6:7.1f}us   "
          f"proj {tproj*1e6:7.1f}us   chanFF {cft*1e6:7.1f}us   ln {tln*1e6:7.1f}us")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "wave"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if which == "wave":
        probe_wave(batch)
    else:
        probe_vip(batch)


if __name__ == "__main__":
    main()
