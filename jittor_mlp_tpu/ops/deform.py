"""Deformable 1x1 sampling ops, TPU-native lowerings.

Two tiers (SURVEY §2.3 items 2-5):

1. CycleFC (cycle_mlp.py:54-131): per-channel integer offsets cycling with
   period K along one axis, known at trace time → lowered to K zero-padded
   static shifts whose contributions are folded into K masked weight matrices,
   i.e. K plain MXU matmuls. No gather at all.

2. ATMOp (active_mlp.py:37-81): learned float offsets along one axis → 1-D
   bilinear gather via take_along_axis with zero out-of-range masking
   (torchvision deform_conv2d's corner-validity semantics), then a 1x1 matmul.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..core import nnf


def _shift_zero(x, axis, s):
    n = x.shape[axis]
    if s == 0:
        return x
    pad = [(0, 0)] * x.ndim
    if s > 0:
        body = lax.slice_in_dim(x, s, n, axis=axis)
        pad[axis] = (0, s)
    else:
        body = lax.slice_in_dim(x, 0, n + s, axis=axis)
        pad[axis] = (-s, 0)
    return jnp.pad(body, pad)


def cycle_fc(p, x, kernel_size):
    """CycleFC on NHWC input: staircase FC with static cyclic integer offsets.

    Channel i samples at spatial offset ((i + K*K'//2... ) — exactly
    cycle_mlp.py:106-122: delta_i = (i + start) % K - K//2 along the non-unit
    kernel axis, start = (kh*kw)//2. Lowered to sum_r shift_r(x) @ W_r^T where
    W_r zeroes all channels with i % K != r.
    """
    kh, kw = kernel_size
    assert kh == 1 or kw == 1
    K = max(kh, kw)
    axis = 1 if kh > 1 else 2
    start = (kh * kw) // 2
    C = x.shape[-1]
    w = p["weight"][:, :, 0, 0]  # (O, C)
    ch = np.arange(C)
    out = 0
    for r in range(K):
        mask = (ch % K) == r
        if not mask.any():
            continue
        delta = int((r + start) % K - K // 2)
        wr = jnp.where(jnp.asarray(mask)[None, :], w, 0.0)
        out = out + jnp.matmul(_shift_zero(x, axis, delta), wr.T)
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"]
    return out


def _linear_sample_1d(x, offset, axis):
    """Per-element 1-D bilinear sample: out[..., i, ...] = lerp of
    x[..., i+off, ...] with zero outside. x, offset: (B, H, W, C)."""
    n = x.shape[axis]
    base = jnp.floor(offset)
    frac = (offset - base).astype(x.dtype)
    idx = jnp.arange(n).reshape(
        [-1 if a == axis else 1 for a in range(x.ndim)]
    )
    pos0 = idx + base.astype(jnp.int32)

    def take(pos):
        valid = (pos >= 0) & (pos < n)
        v = jnp.take_along_axis(x, jnp.clip(pos, 0, n - 1), axis=axis)
        return jnp.where(valid, v, 0.0)

    return take(pos0) * (1.0 - frac) + take(pos0 + 1) * frac


def atm_op(p, x, offset, dimension):
    """ActiveMLP ATMOp on NHWC: per-channel learned float offset along one
    axis, then 1x1 matmul (active_mlp.py:65-81)."""
    axis = 1 if dimension == "h" else 2
    y = _linear_sample_1d(x, offset, axis)
    out = jnp.matmul(y, p["weight"][:, :, 0, 0].T)
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"]
    return out
