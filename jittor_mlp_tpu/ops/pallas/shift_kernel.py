"""AS-MLP axial shift as a Pallas kernel with a custom VJP.

TPU counterpart of the reference's cupy CUDA pair shift_forward_kernel /
shift_backward_grad_input_kernel (models_pytorch/utils/shift_cuda.py:44-103):
channel group g (of ceil(C/shift) channels) reads from position h + s with
s = -(g - shift//2), zero outside; the backward pass is the same shift with s
negated — exactly what the reference's backward kernel hand-codes.

The XLA pad/slice lowering (ops/shift.axial_shift) is the default (it fuses
into neighboring 1x1 matmuls); this kernel exists for fusion experiments and
as the in-kernel building block for a fully fused AxialShift block.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_kernel(x_ref, o_ref, *, shift_size, axis, sign):
    x = x_ref[0]  # (H, W, C)
    H, W, C = x.shape
    group = math.ceil(C / shift_size)
    n = x.shape[axis - 1]
    parts = []
    for c0 in range(0, C, group):
        c1 = min(c0 + group, C)
        g = c0 // group
        s = sign * -(g - shift_size // 2)
        part = x[..., c0:c1]
        if s == 0:
            parts.append(part)
            continue
        pad = [(0, 0), (0, 0), (0, 0)]
        if s > 0:
            body = jax.lax.slice_in_dim(part, s, n, axis=axis - 1)
            pad[axis - 1] = (0, s)
        else:
            body = jax.lax.slice_in_dim(part, 0, n + s, axis=axis - 1)
            pad[axis - 1] = (-s, 0)
        parts.append(jnp.pad(body, pad))
    o_ref[0] = jnp.concatenate(parts, axis=-1)


def _call(x, shift_size, axis, sign):
    B = x.shape[0]
    return pl.pallas_call(
        functools.partial(
            _shift_kernel, shift_size=shift_size, axis=axis, sign=sign
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, *x.shape[1:]), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, *x.shape[1:]), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )(x)


def _call_any_axis(x, shift_size, axis, sign):
    # sublane-axis (axis=2) pad/slice inside the kernel crashes this Mosaic
    # toolchain; route it through an H<->W transpose around the axis-1 kernel
    # (the transposes fuse in XLA around the custom call).
    if axis == 2:
        y = _call(jnp.swapaxes(x, 1, 2), shift_size, 1, sign)
        return jnp.swapaxes(y, 1, 2)
    return _call(x, shift_size, axis, sign)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def axial_shift_pallas(x, shift_size, axis):
    """x: (B, H, W, C); axis 1 (H) or 2 (W)."""
    return _call_any_axis(x, shift_size, axis, sign=1)


def _fwd(x, shift_size, axis):
    return _call_any_axis(x, shift_size, axis, sign=1), None


def _bwd(shift_size, axis, _, g):
    # mirrors shift_backward_grad_input_kernel (shift_cuda.py:75-103): the
    # same per-group shift with s negated. Uses the XLA pad/slice lowering
    # (the sign-flipped Pallas variant trips a Mosaic compiler crash on this
    # toolchain; the XLA form fuses into the surrounding backward anyway).
    from ..shift import _shift_zero

    C = g.shape[-1]
    group = math.ceil(C / shift_size)
    parts = []
    for c0 in range(0, C, group):
        gi = c0 // group
        s = gi - shift_size // 2
        parts.append(_shift_zero(g[..., c0 : min(c0 + group, C)], axis, s))
    return (jnp.concatenate(parts, axis=-1),)


axial_shift_pallas.defvjp(_fwd, _bwd)
