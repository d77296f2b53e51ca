"""Spatial-shift token mixers as static slice/concat compositions.

The reference implements these as in-place strided assignments
(s2_mlp_v1.py:15-25, s2_mlp_v2.py:15-29) whose effective semantics — under
Jittor's lazy graph and the CUDA copy kernels the parity harness validated —
are *functional*: shifted interior, boundary rows keeping their original
values. (torch CPU actually cascades on these overlapping views; that is UB
the paper never intended.) On TPU the static slices fuse into neighboring
matmuls; no gathers.

Also here: the edge-zero "torch_shift" family used by AS-MLP
(shift_cuda.py:44-72, 195-205) where out-of-range positions are zero because
the input is zero-padded before the roll.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def _shift_edge(x, axis, direction):
    """out[i] = x[i-direction] in-range; boundary keeps original x values.

    direction=+1 reproduces ``x[1:] = x[:-1]`` (functional read), -1 the
    mirror ``x[:-1] = x[1:]``.
    """
    n = x.shape[axis]
    if direction == 1:
        lead = lax.slice_in_dim(x, 0, 1, axis=axis)
        rest = lax.slice_in_dim(x, 0, n - 1, axis=axis)
        return jnp.concatenate([lead, rest], axis=axis)
    else:
        rest = lax.slice_in_dim(x, 1, n, axis=axis)
        tail = lax.slice_in_dim(x, n - 1, n, axis=axis)
        return jnp.concatenate([rest, tail], axis=axis)


def spatial_shift1(x):
    """S2-MLP 4-way shift (s2_mlp_v1.py:19-25): channel group boundaries are
    the reference's exact c//4, c//2, 3c//4 slices (they differ from equal
    quarters when c % 4 != 0); groups shift +1/-1 along axis 1 then axis 2."""
    c = x.shape[-1]
    b1, b2, b3 = c // 4, c // 2, 3 * c // 4
    return jnp.concatenate(
        [
            _shift_edge(x[..., :b1], 1, +1),
            _shift_edge(x[..., b1:b2], 1, -1),
            _shift_edge(x[..., b2:b3], 2, +1),
            _shift_edge(x[..., b3:], 2, -1),
        ],
        axis=-1,
    )


def spatial_shift2(x):
    """Opposite pattern (s2_mlp_v2.py:23-29): axes swapped vs spatial_shift1."""
    c = x.shape[-1]
    b1, b2, b3 = c // 4, c // 2, 3 * c // 4
    return jnp.concatenate(
        [
            _shift_edge(x[..., :b1], 2, +1),
            _shift_edge(x[..., b1:b2], 2, -1),
            _shift_edge(x[..., b2:b3], 1, +1),
            _shift_edge(x[..., b3:], 1, -1),
        ],
        axis=-1,
    )


def _shift_zero(x, axis, s):
    """out[i] = x[i+s] in-range else 0 (zero-padded shift)."""
    n = x.shape[axis]
    if s == 0:
        return x
    if s > 0:
        body = lax.slice_in_dim(x, s, n, axis=axis)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, s)
    else:
        body = lax.slice_in_dim(x, 0, n + s, axis=axis)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (-s, 0)
    return jnp.pad(body, pad)


def axial_shift(x, shift_size, axis):
    """AS-MLP shift on NHWC input over ``axis`` (1=H, 2=W).

    Channel group g (of ``ceil(C/shift)`` channels) reads from position
    h + s with s = -(g - shift//2), zero outside — the semantics of the
    reference CUDA kernel (shift_cuda.py:44-72) and its torch_shift
    fallback (shift_cuda.py:195-205). Static per-group offsets → pad/slice
    composition XLA fuses; a Pallas variant lives in ops/pallas.
    """
    C = x.shape[-1]
    group = math.ceil(C / shift_size)
    parts = []
    for c0 in range(0, C, group):
        g = c0 // group
        s = -(g - shift_size // 2)
        parts.append(_shift_zero(x[..., c0 : min(c0 + group, C)], axis, s))
    return jnp.concatenate(parts, axis=-1)
