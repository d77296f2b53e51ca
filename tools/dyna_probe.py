"""DynaMixer forward cost anatomy + candidate restructurings, on-chip.

Round-2 left dyna_mlp at 1,338 img/s with the note "MXU-utilization bound,
block-diagonal restructurings measured slower". This probe decomposes the
block cost by ablating `_dyna_op` stages (monkeypatch — the apply closure
resolves the module global at trace time) and times candidate reformulations
of the attention application, using bench.py's fori_loop/t(N)-t(1) protocol.

Variants:
  full        production path (models/dyna_mlp.py::_dyna_op)
  no_apply    p + attend + softmax computed (kept live), apply skipped
  identity    _dyna_op = proc(x) only — isolates everything but proc
  einsum      attn built in (b,h,s,w,o) order directly + application as one
              einsum on the free reshape of x (no explicit 5-D transposes)
  nosoftmax   full minus the softmax (sizes the 5-D softmax's cost)

Usage: python tools/dyna_probe.py [--batch 64] [--iters 10] [--model M]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import jittor_mlp_tpu as jm  # noqa: E402
from jittor_mlp_tpu import config  # noqa: E402
from jittor_mlp_tpu.core import nnf  # noqa: E402
from jittor_mlp_tpu.models import dyna_mlp as dm  # noqa: E402


def _op_no_apply(op, x, seg, hidden, axis):
    B, H, W, C = x.shape
    if axis == 1:
        x = jnp.swapaxes(x, 1, 2)
        H, W = W, H
    p = jnp.einsum("bhwc,soc->bhwso", x, op["wd_w"],
                   precision=nnf._prec()) + op["wd_b"]
    attn = p.transpose(0, 1, 3, 2, 4).reshape(B, H, seg, W * hidden)
    attn = nnf.linear(op["attend"], attn).reshape(B, H, seg, W, W)
    attn = nnf.softmax(attn, axis=-1)
    y = nnf.linear(op["proc"], x)
    y = y + (attn[:, :1, :1, :1, :1] * 0).reshape(B, 1, 1, 1)
    if axis == 1:
        y = jnp.swapaxes(y, 1, 2)
    return y


def _op_identity(op, x, seg, hidden, axis):
    if axis == 1:
        x = jnp.swapaxes(x, 1, 2)
    y = nnf.linear(op["proc"], x)
    if axis == 1:
        y = jnp.swapaxes(y, 1, 2)
    return y


def _op_einsum(op, x, seg, hidden, axis, softmax=True):
    B, H, W, C = x.shape
    d = C // seg
    if axis == 1:
        x = jnp.swapaxes(x, 1, 2)
        H, W = W, H
    # emit p directly in (b,h,s,w,o) order; (s, w*o) reshape is then free
    p = jnp.einsum("bhwc,soc->bhswo", x, op["wd_w"],
                   precision=nnf._prec()) + op["wd_b"][:, None, :]
    attn = p.reshape(B, H, seg, W * hidden)
    attn = nnf.linear(op["attend"], attn).reshape(B, H, seg, W, W)
    if softmax:
        attn = nnf.softmax(attn, axis=-1)
    x5 = x.reshape(B, H, W, seg, d)
    y = jnp.einsum("bhsvw,bhwsd->bhvsd", attn, x5, precision=nnf._prec())
    y = nnf.linear(op["proc"], y.reshape(B, H, W, C))
    if axis == 1:
        y = jnp.swapaxes(y, 1, 2)
    return y


def _op_nosoftmax(op, x, seg, hidden, axis):
    B, H, W, C = x.shape
    d = C // seg
    if axis == 1:
        x = jnp.swapaxes(x, 1, 2)
        H, W = W, H
    p = jnp.einsum("bhwc,soc->bhwso", x, op["wd_w"],
                   precision=nnf._prec()) + op["wd_b"]
    attn = p.transpose(0, 1, 3, 2, 4).reshape(B, H, seg, W * hidden)
    attn = nnf.linear(op["attend"], attn).reshape(B, H, seg, W, W)
    inp = x.reshape(B, H, W, seg, d).transpose(0, 1, 3, 2, 4)
    y = jnp.matmul(attn, inp, precision=nnf._prec())
    y = y.transpose(0, 1, 3, 2, 4).reshape(B, H, W, C)
    y = nnf.linear(op["proc"], y)
    if axis == 1:
        y = jnp.swapaxes(y, 1, 2)
    return y


def _op_vpu_unroll(op, x, seg, hidden, axis):
    """Attention application as W unrolled broadcast-FMAs on the VPU.

    The contraction length is only W (16/32); the MXU runs it at ~0.1% peak
    as 16k tiny batched matmuls. Unrolled, each term is an elementwise
    (B,H,s,v,d) FMA with attn broadcast along lanes (d) and the x slice
    broadcast along sublanes (v) — the ActiveMLP banded-shift trick applied
    to content-dependent mixing."""
    B, H, W, C = x.shape
    d = C // seg
    if axis == 1:
        x = jnp.swapaxes(x, 1, 2)
        H, W = W, H
    p = jnp.einsum("bhwc,soc->bhswo", x, op["wd_w"],
                   precision=nnf._prec()) + op["wd_b"][:, None, :]
    attn = p.reshape(B, H, seg, W * hidden)
    attn = nnf.linear(op["attend"], attn).reshape(B, H, seg, W, W)
    attn = nnf.softmax(attn, axis=-1)
    xs = x.reshape(B, H, W, seg, d).transpose(0, 1, 3, 2, 4)  # B,H,s,w,d
    acc = attn[..., 0:1] * xs[:, :, :, 0:1]
    for w in range(1, W):
        acc = acc + attn[..., w:w + 1] * xs[:, :, :, w:w + 1]
    y = acc.transpose(0, 1, 3, 2, 4).reshape(B, H, W, C)
    y = nnf.linear(op["proc"], y)
    if axis == 1:
        y = jnp.swapaxes(y, 1, 2)
    return y


def _op_vpu_expand(op, x, seg, hidden, axis):
    """Per-w unroll in full-C lanes: expand attn over segments by a tiny
    (s → C) one-hot matmul per w, then FMA in (B,H,v,C) layout — both
    operands lane-aligned at C (192/384), no sub-128 minor dims."""
    B, H, W, C = x.shape
    d = C // seg
    if axis == 1:
        x = jnp.swapaxes(x, 1, 2)
        H, W = W, H
    p = jnp.einsum("bhwc,soc->bhswo", x, op["wd_w"],
                   precision=nnf._prec()) + op["wd_b"][:, None, :]
    attn = p.reshape(B, H, seg, W * hidden)
    attn = nnf.linear(op["attend"], attn).reshape(B, H, seg, W, W)
    attn = nnf.softmax(attn, axis=-1)
    expand = jnp.repeat(jnp.eye(seg, dtype=x.dtype), d, axis=1)  # (s, C)
    acc = None
    for w in range(W):
        a_w = jnp.einsum("bhsv,sc->bhvc", attn[..., w], expand,
                         precision=nnf._prec())
        term = a_w * x[:, :, w:w + 1, :]
        acc = term if acc is None else acc + term
    y = nnf.linear(op["proc"], acc)
    if axis == 1:
        y = jnp.swapaxes(y, 1, 2)
    return y


def _op_vpu_dv(op, x, seg, hidden, axis):
    """vpu_unroll with (d, v) minor order instead of (v, d)."""
    B, H, W, C = x.shape
    d = C // seg
    if axis == 1:
        x = jnp.swapaxes(x, 1, 2)
        H, W = W, H
    p = jnp.einsum("bhwc,soc->bhswo", x, op["wd_w"],
                   precision=nnf._prec()) + op["wd_b"][:, None, :]
    attn = p.reshape(B, H, seg, W * hidden)
    attn = nnf.linear(op["attend"], attn).reshape(B, H, seg, W, W)
    attn = nnf.softmax(attn, axis=-1)
    xs = x.reshape(B, H, W, seg, d).transpose(0, 1, 3, 4, 2)  # B,H,s,d,w
    acc = jnp.zeros((B, H, seg, d, W), x.dtype)
    for w in range(W):
        # y[b,h,s,d,v] += x[b,h,s,d,w] * attn[b,h,s,v,w]
        acc = acc + xs[..., w:w + 1] * attn[:, :, :, None, :, w]
    y = acc.transpose(0, 1, 4, 2, 3).reshape(B, H, W, C)
    y = nnf.linear(op["proc"], y)
    if axis == 1:
        y = jnp.swapaxes(y, 1, 2)
    return y


def _op_bmr(op, x, seg, hidden, axis):
    """Broadcast-multiply-reduce: y = sum_w attn[...,v,w,1] * x[...,1,w,d]
    as ONE fused product+reduction, so the w-accumulation never round-trips
    HBM (vpu_unroll's W separate adds do)."""
    B, H, W, C = x.shape
    d = C // seg
    if axis == 1:
        x = jnp.swapaxes(x, 1, 2)
        H, W = W, H
    p = jnp.einsum("bhwc,soc->bhswo", x, op["wd_w"],
                   precision=nnf._prec()) + op["wd_b"][:, None, :]
    attn = p.reshape(B, H, seg, W * hidden)
    attn = nnf.linear(op["attend"], attn).reshape(B, H, seg, W, W)
    attn = nnf.softmax(attn, axis=-1)
    xs = x.reshape(B, H, W, seg, d).transpose(0, 1, 3, 2, 4)  # B,H,s,w,d
    y5 = jnp.sum(attn[..., None] * xs[:, :, :, None, :, :], axis=4)
    y = y5.transpose(0, 1, 3, 2, 4).reshape(B, H, W, C)
    y = nnf.linear(op["proc"], y)
    if axis == 1:
        y = jnp.swapaxes(y, 1, 2)
    return y


def _op_bmr_wmajor(op, x, seg, hidden, axis):
    """Broadcast-multiply-reduce with the contraction dim w MAJOR: the
    product tensor is (w, B, H, s, v, d) and the reduce is over axis 0,
    the shape XLA fuses into a register-resident accumulation loop; the
    x transpose to w-major leaves its (s, d) minor dims untouched."""
    B, H, W, C = x.shape
    d = C // seg
    if axis == 1:
        x = jnp.swapaxes(x, 1, 2)
        H, W = W, H
    p = jnp.einsum("bhwc,soc->bhswo", x, op["wd_w"],
                   precision=nnf._prec()) + op["wd_b"][:, None, :]
    attn = p.reshape(B, H, seg, W * hidden)
    attn = nnf.linear(op["attend"], attn).reshape(B, H, seg, W, W)
    attn = nnf.softmax(attn, axis=-1)
    aw = attn.transpose(4, 0, 1, 2, 3)                  # w,B,H,s,v
    xw = x.reshape(B, H, W, seg, d).transpose(2, 0, 1, 3, 4)  # w,B,H,s,d
    y5 = jnp.sum(aw[..., None] * xw[:, :, :, :, None, :], axis=0)  # B,H,s,v,d
    y = y5.transpose(0, 1, 3, 2, 4).reshape(B, H, W, C)
    y = nnf.linear(op["proc"], y)
    if axis == 1:
        y = jnp.swapaxes(y, 1, 2)
    return y


VARIANTS = {
    "full": dm._dyna_op,
    "no_apply": _op_no_apply,
    "identity": _op_identity,
    "einsum": _op_einsum,
    "nosoftmax": _op_nosoftmax,
    "vpu_unroll": _op_vpu_unroll,
    "vpu_expand": _op_vpu_expand,
    "vpu_dv": _op_vpu_dv,
    "bmr": _op_bmr,
    "bmr_wmajor": _op_bmr_wmajor,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--model", default="M")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    config.enable_compile_cache()
    model = jm.DynaMixer(model_name=args.model)
    model.to_bf16()
    params, apply = model.params, model.apply
    B, ITERS = args.batch, args.iters
    orig = dm._dyna_op

    for name in args.variants.split(","):
        dm._dyna_op = VARIANTS[name]
        try:
            with config.bf16_mode():

                @jax.jit
                def run(params, n):
                    x = jax.random.normal(
                        jax.random.PRNGKey(0), (B, 3, 224, 224), jnp.bfloat16
                    )

                    def body(i, carry):
                        acc, x = carry
                        xp = x + (acc * 1e-8).astype(jnp.bfloat16)
                        out = apply(params, xp)
                        return acc + out[0, 0].astype(jnp.float32), x

                    acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0.0), x))
                    return acc

                def timed(n):
                    t0 = time.perf_counter()
                    np.asarray(run(params, n))
                    return time.perf_counter() - t0

                timed(1)
                timed(ITERS)
                base = min(timed(1) for _ in range(3))
                total = min(timed(ITERS) for _ in range(2))
                img_s = B * (ITERS - 1) / (total - base)
            print(json.dumps({
                "variant": name,
                "img_s": round(img_s, 1),
                "batch": B,
                "model": args.model,
            }), flush=True)
        finally:
            dm._dyna_op = orig


if __name__ == "__main__":
    main()
