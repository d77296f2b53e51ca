"""Kernel tuning lab: time fused-mixer-block variants on the real chip.

Times the 12-block Mixer-B/16 stack (the bench.py hot loop) with the
production kernel and with candidate variants, printing img/s for each so
kernel changes are justified by measurement, not guesswork.

Usage: python tools/kernel_lab.py [--batch 256] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from jittor_mlp_tpu.ops.pallas.mixer_block import (  # noqa: E402
    _act_for,
    _gelu,
    _ln,
    fused_mixer_block,
)

N, D, TD, CD = 196, 768, 384, 3072
DEPTH = 12


# --- variant A: wide token matmul (images stacked along the lane axis) -----
def _kernel_wide(
    x_ref,
    ln1w_ref, ln1b_ref, wt1_ref, bt1_ref, wt2_ref, bt2_ref,
    ln2w_ref, ln2b_ref, wc1t_ref, bc1_ref, wc2t_ref, bc2_ref,
    out_ref,
    h_scr,
    *, bt,
):
    dtype = x_ref.dtype
    act = _act_for(dtype)  # production choice: tanh GELU for bf16
    n = x_ref.shape[1]
    np_ = wt1_ref.shape[1]
    d = x_ref.shape[2]
    # LN per (image, token) in native layout, then relayout to (Np, bt*D) so
    # both token matmuls run once at full width instead of per image.
    xn = _ln(
        x_ref[:].reshape(bt * n, d), ln1w_ref[:], ln1b_ref[:]
    ).astype(dtype).reshape(bt, n, d)
    xall = jnp.pad(
        xn.transpose(1, 0, 2).reshape(n, bt * d), ((0, np_ - n), (0, 0))
    )
    t = jnp.dot(wt1_ref[:], xall, preferred_element_type=jnp.float32)
    t = act(t + bt1_ref[:].astype(jnp.float32)[:, None]).astype(dtype)
    t2 = jnp.dot(wt2_ref[:], t, preferred_element_type=jnp.float32)[:n]
    t2 = t2 + bt2_ref[:].astype(jnp.float32)[:, None]
    h = (
        x_ref[:].astype(jnp.float32)
        + t2.reshape(n, bt, d).transpose(1, 0, 2)
    )
    h_scr[:] = h.astype(dtype)
    hn = _ln(
        h_scr[:].reshape(bt * n, d), ln2w_ref[:], ln2b_ref[:]
    ).astype(dtype)
    c = jnp.dot(hn, wc1t_ref[:], preferred_element_type=jnp.float32)
    c = act(c + bc1_ref[:].astype(jnp.float32)).astype(dtype)
    c2 = jnp.dot(c, wc2t_ref[:], preferred_element_type=jnp.float32)
    c2 = c2 + bc2_ref[:].astype(jnp.float32)
    out_ref[:] = (
        h_scr[:].astype(jnp.float32) + c2.reshape(bt, n, d)
    ).astype(dtype)


# --- variant A2: token-major resident layout (round 5) ---------------------
# wide2's two in-kernel (N, bt, D) transposes cost more than its 2×-wider
# token matmuls saved. This variant removes the transposes instead of the
# width: the activation lives as (G, N, bt, D) across the WHOLE stack (one
# XLA transpose before the scan, one after), so inside the kernel
#   token matmuls : (N, bt, D) -> reshape (N, bt·D)   (free, contiguous)
#   channel matmuls: (N, bt, D) -> reshape (N·bt, D)  (free, contiguous)
# — the wide MXU passes with zero VPU relayout.
def _kernel_tokmajor(
    x_ref,
    ln1w_ref, ln1b_ref, wt1_ref, bt1_ref, wt2_ref, bt2_ref,
    ln2w_ref, ln2b_ref, wc1t_ref, bc1_ref, wc2t_ref, bc2_ref,
    out_ref,
    h_scr,
    *, bt,
):
    dtype = x_ref.dtype
    act = _act_for(dtype)
    n = x_ref.shape[1]
    np_ = wt1_ref.shape[1]
    d = x_ref.shape[3]
    x = x_ref[0]  # (N, bt, D)
    xn = _ln(x.reshape(n * bt, d), ln1w_ref[:], ln1b_ref[:]).astype(dtype)
    xall = jnp.pad(xn.reshape(n, bt * d), ((0, np_ - n), (0, 0)))
    t = jnp.dot(wt1_ref[:], xall, preferred_element_type=jnp.float32)
    t = act(t + bt1_ref[:].astype(jnp.float32)[:, None]).astype(dtype)
    t2 = jnp.dot(wt2_ref[:], t, preferred_element_type=jnp.float32)[:n]
    h = (
        x.astype(jnp.float32).reshape(n, bt * d)
        + t2
        + bt2_ref[:].astype(jnp.float32)[:, None]
    )
    h_scr[0] = h.reshape(n, bt, d).astype(dtype)
    hn = _ln(h.reshape(n * bt, d), ln2w_ref[:], ln2b_ref[:]).astype(dtype)
    c = jnp.dot(hn, wc1t_ref[:], preferred_element_type=jnp.float32)
    c = act(c + bc1_ref[:].astype(jnp.float32)).astype(dtype)
    c2 = jnp.dot(c, wc2t_ref[:], preferred_element_type=jnp.float32)
    c2 = c2 + bc2_ref[:].astype(jnp.float32)
    out_ref[0] = (
        h_scr[0].astype(jnp.float32) + c2.reshape(n, bt, d)
    ).astype(dtype)


def _call_tokmajor(x, weights, bt):
    """x: (G, N, bt, D) token-major activation (relayout done by the caller,
    OUTSIDE the per-block call so the stack pays it once, not per block)."""
    G = x.shape[0]
    ln1w, ln1b, wt1, bt1, wt2, bt2, ln2w, ln2b, wc1, bc1, wc2, bc2 = weights
    Np = -(-N // 128) * 128
    wt1p = jnp.pad(wt1, ((0, 0), (0, Np - N)))
    wt2p = jnp.pad(wt2, ((0, Np - N), (0, 0)))
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * G * bt * N * D * (2 * TD + 2 * CD)
    return pl.pallas_call(
        functools.partial(_kernel_tokmajor, bt=bt),
        out_shape=jax.ShapeDtypeStruct((G, N, bt, D), x.dtype),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, N, bt, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[vec] * 12,
        ],
        out_specs=pl.BlockSpec(
            (1, N, bt, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((1, N, bt, D), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * G * bt * N * D * x.dtype.itemsize,
            transcendentals=G * bt * N * (TD + CD),
        ),
    )(x, ln1w, ln1b, wt1p, bt1, wt2p, bt2, ln2w, ln2b, wc1.T, bc1, wc2.T, bc2)


def _to_tokmajor(x, bt):
    B, n, d = x.shape
    return x.reshape(B // bt, bt, n, d).transpose(0, 2, 1, 3)


def _from_tokmajor(x):
    G, n, bt, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(G * bt, n, d)


# --- skeleton variants: ablate VPU work to locate the non-MXU time ---------
def _make_kernel_ablate(use_gelu, use_ln, erf_terms=5):
    def act(z):
        if use_gelu == "exact":
            return _gelu(z)
        if use_gelu == "fast3":
            # A&S 7.1.25 3-term erf (|err| < 2.5e-5 — far below bf16 noise)
            s = jnp.sign(z)
            a = jnp.abs(z) * 0.7071067811865476
            t = 1.0 / (1.0 + 0.47047 * a)
            poly = t * (0.3480242 + t * (-0.0958798 + t * 0.7478556))
            erf = s * (1.0 - poly * jnp.exp(-a * a))
            return 0.5 * z * (1.0 + erf)
        if use_gelu == "tanh":
            return 0.5 * z * (
                1.0 + jnp.tanh(0.7978845608 * (z + 0.044715 * z * z * z))
            )
        return jnp.maximum(z, 0.0)  # relu skeleton

    def ln(x, w, b):
        if use_ln:
            return _ln(x, w, b)
        return x.astype(jnp.float32)

    def kernel(
        x_ref,
        ln1w_ref, ln1b_ref, wt1_ref, bt1_ref, wt2_ref, bt2_ref,
        ln2w_ref, ln2b_ref, wc1t_ref, bc1_ref, wc2t_ref, bc2_ref,
        out_ref,
        h_scr,
        *, bt,
    ):
        dtype = x_ref.dtype
        n = x_ref.shape[1]
        np_ = wt1_ref.shape[1]
        for i in range(bt):
            x = x_ref[i]
            xn = ln(x, ln1w_ref[:], ln1b_ref[:]).astype(dtype)
            xn = jnp.pad(xn, ((0, np_ - n), (0, 0)))
            t = jnp.dot(wt1_ref[:], xn, preferred_element_type=jnp.float32)
            t = act(t + bt1_ref[:].astype(jnp.float32)[:, None]).astype(dtype)
            t2 = jnp.dot(wt2_ref[:], t, preferred_element_type=jnp.float32)[:n]
            h = x.astype(jnp.float32) + t2 + bt2_ref[:].astype(jnp.float32)[:, None]
            h_scr[i] = h.astype(dtype)
        hn = ln(
            h_scr[:].reshape(bt * n, -1), ln2w_ref[:], ln2b_ref[:]
        ).astype(dtype)
        c = jnp.dot(hn, wc1t_ref[:], preferred_element_type=jnp.float32)
        c = act(c + bc1_ref[:].astype(jnp.float32)).astype(dtype)
        c2 = jnp.dot(c, wc2t_ref[:], preferred_element_type=jnp.float32)
        c2 = c2 + bc2_ref[:].astype(jnp.float32)
        out_ref[:] = (
            h_scr[:].astype(jnp.float32) + c2.reshape(bt, n, -1)
        ).astype(dtype)

    return kernel


# --- variant B: per-image loop but h kept in out_ref (no scratch) ----------
def _kernel_noscratch(
    x_ref,
    ln1w_ref, ln1b_ref, wt1_ref, bt1_ref, wt2_ref, bt2_ref,
    ln2w_ref, ln2b_ref, wc1t_ref, bc1_ref, wc2t_ref, bc2_ref,
    out_ref,
    *, bt,
):
    dtype = x_ref.dtype
    n = x_ref.shape[1]
    np_ = wt1_ref.shape[1]
    for i in range(bt):
        x = x_ref[i]
        xn = _ln(x, ln1w_ref[:], ln1b_ref[:]).astype(dtype)
        xn = jnp.pad(xn, ((0, np_ - n), (0, 0)))
        t = jnp.dot(wt1_ref[:], xn, preferred_element_type=jnp.float32)
        t = _gelu(t + bt1_ref[:].astype(jnp.float32)[:, None]).astype(dtype)
        t2 = jnp.dot(wt2_ref[:], t, preferred_element_type=jnp.float32)[:n]
        h = x.astype(jnp.float32) + t2 + bt2_ref[:].astype(jnp.float32)[:, None]
        out_ref[i] = h.astype(dtype)
    hn = _ln(
        out_ref[:].reshape(bt * n, -1), ln2w_ref[:], ln2b_ref[:]
    ).astype(dtype)
    c = jnp.dot(hn, wc1t_ref[:], preferred_element_type=jnp.float32)
    c = _gelu(c + bc1_ref[:].astype(jnp.float32)).astype(dtype)
    c2 = jnp.dot(c, wc2t_ref[:], preferred_element_type=jnp.float32)
    c2 = c2 + bc2_ref[:].astype(jnp.float32)
    out_ref[:] = (
        out_ref[:].astype(jnp.float32) + c2.reshape(bt, n, -1)
    ).astype(dtype)


def _call(kernel, x, weights, bt, scratch):
    B = x.shape[0]
    ln1w, ln1b, wt1, bt1, wt2, bt2, ln2w, ln2b, wc1, bc1, wc2, bc2 = weights
    Np = -(-N // 128) * 128
    wt1p = jnp.pad(wt1, ((0, 0), (0, Np - N)))
    wt2p = jnp.pad(wt2, ((0, Np - N), (0, 0)))
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * B * N * D * (2 * TD + 2 * CD)
    return pl.pallas_call(
        functools.partial(kernel, bt=bt),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[vec] * 12,
        ],
        out_specs=pl.BlockSpec(
            (bt, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=(
            [pltpu.VMEM((bt, N, D), x.dtype)] if scratch else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * (TD + CD),
        ),
    )(x, ln1w, ln1b, wt1p, bt1, wt2p, bt2, ln2w, ln2b, wc1.T, bc1, wc2.T, bc2)


def make_weights(key):
    ks = jax.random.split(key, 12)
    shapes = [
        (D,), (D,), (TD, N), (TD,), (N, TD), (N,),
        (D,), (D,), (CD, D), (CD,), (D, CD), (D,),
    ]
    return tuple(
        (jax.random.normal(k, s, jnp.float32) * 0.02).astype(jnp.bfloat16)
        for k, s in zip(ks, shapes)
    )


def bench_stack(name, block_apply, batch, iters, stacked, pre=None, post=None):
    """Time `iters` passes of the 12-block stack with a data dependency.

    ``pre``/``post`` relayout the activation once around the whole scan
    (layout-persistent variants pay their transform per stack, not per
    block — exactly how a model would run them)."""

    @jax.jit
    def run(w, seed, nit):
        x = jax.random.normal(
            jax.random.PRNGKey(seed), (batch, N, D), jnp.bfloat16
        )

        def body(i, carry):
            acc, x = carry
            xp = x + (acc * 1e-8).astype(jnp.bfloat16)
            if pre is not None:
                xp = pre(xp)

            def layer(h, wi):
                return block_apply(wi, h), None

            out, _ = lax.scan(layer, xp, w)
            if post is not None:
                out = post(out)
            return acc + out[0, 0, 0].astype(jnp.float32), x

        acc, _ = lax.fori_loop(0, nit, body, (jnp.float32(0.0), x))
        return acc

    def timed(nit):
        t0 = time.perf_counter()
        np.asarray(run(stacked, 0, nit))
        return time.perf_counter() - t0

    timed(1)
    timed(iters)
    base = min(timed(1) for _ in range(3))
    total = min(timed(iters) for _ in range(2))
    dt = total - base
    img_s = batch * (iters - 1) / dt
    gflops = 2 * N * D * (2 * TD + 2 * CD) * DEPTH / 1e9
    print(
        f"{name:34s} {img_s:9.0f} img/s   "
        f"{img_s * gflops / 1000:6.1f} TFLOPS (stack only)"
    )
    return img_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--variants", default="prod2,prod4,wide2,wide4,noscratch2,noscratch4"
    )
    args = ap.parse_args()

    weights = make_weights(jax.random.PRNGKey(0))
    stacked = tuple(
        jnp.stack([w] * DEPTH) for w in weights
    )

    # correctness check vs production kernel on a small batch
    xs = jax.random.normal(jax.random.PRNGKey(1), (8, N, D), jnp.bfloat16)
    want = np.asarray(
        fused_mixer_block(xs, *weights, bt=2), dtype=np.float32
    )
    for nm, fn in [
        ("wide", lambda x, w, bt: _call(_kernel_wide, x, w, bt, True)),
        ("noscratch", lambda x, w, bt: _call(_kernel_noscratch, x, w, bt, False)),
        ("tokmajor", lambda x, w, bt: _from_tokmajor(
            _call_tokmajor(_to_tokmajor(x, bt), w, bt))),
    ]:
        got = np.asarray(fn(xs, weights, 2), dtype=np.float32)
        err = np.max(np.abs(got - want))
        print(f"check {nm:12s} max|Δ| vs prod = {err:.3e}")
        assert err < 1e-2, (nm, err)

    variants = {
        "prod2": lambda w, h: fused_mixer_block(h, *w, bt=2),
        "prod4": lambda w, h: fused_mixer_block(h, *w, bt=4),
        "wide2": lambda w, h: _call(_kernel_wide, h, w, 2, True),
        "wide4": lambda w, h: _call(_kernel_wide, h, w, 4, True),
        "tokmajor2": lambda w, h: _call_tokmajor(h, w, 2),
        "tokmajor4": lambda w, h: _call_tokmajor(h, w, 4),
        "tokmajor8": lambda w, h: _call_tokmajor(h, w, 8),
        "noscratch2": lambda w, h: _call(_kernel_noscratch, h, w, 2, False),
        "noscratch4": lambda w, h: _call(_kernel_noscratch, h, w, 4, False),
        "relu_skel": lambda w, h: _call(
            _make_kernel_ablate("relu", True), h, w, 2, True),
        "noln_skel": lambda w, h: _call(
            _make_kernel_ablate("exact", False), h, w, 2, True),
        "matmul_skel": lambda w, h: _call(
            _make_kernel_ablate("relu", False), h, w, 2, True),
        "gelu_fast3": lambda w, h: _call(
            _make_kernel_ablate("fast3", True), h, w, 2, True),
        "gelu_tanh": lambda w, h: _call(
            _make_kernel_ablate("tanh", True), h, w, 2, True),
        "plain_xla": None,
    }

    def plain(w, h):
        ln1w, ln1b, wt1, bt1, wt2, bt2, ln2w, ln2b, wc1, bc1, wc2, bc2 = w
        def ln(x, g, b):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
            return ((xf - mu) * lax.rsqrt(var + 1e-5) * g + b).astype(x.dtype)
        y = jnp.einsum("oi,bid->bod", wt1, ln(h, ln1w, ln1b)) + bt1[None, :, None]
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(h.dtype)
        h = h + jnp.einsum("oi,bid->bod", wt2, y) + bt2[None, :, None]
        c = jnp.matmul(ln(h, ln2w, ln2b), wc1.T) + bc1
        c = jax.nn.gelu(c.astype(jnp.float32), approximate=False).astype(h.dtype)
        return h + jnp.matmul(c, wc2.T) + bc2

    variants["plain_xla"] = plain

    for name in args.variants.split(","):
        if name not in variants:
            continue
        pre = post = None
        if name.startswith("tokmajor"):
            bt = int(name[len("tokmajor"):])
            pre = functools.partial(_to_tokmajor, bt=bt)
            post = _from_tokmajor
        try:
            bench_stack(name, variants[name], args.batch, args.iters, stacked,
                        pre=pre, post=post)
        except Exception as e:  # VMEM overflow etc. — report and continue
            print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
