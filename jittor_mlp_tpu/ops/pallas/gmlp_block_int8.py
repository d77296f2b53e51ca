"""Fused W8A8 int8 gMLP block: serving at the MXU's 2× int8 rate.

Same block semantics as gmlp_block._kernel (reference:
/root/reference/models_pytorch/g_mlp.py:24-39), every matmul an
int8×int8→int32 MXU contraction (the mixer_block_int8 recipe):

  - weights quantized ONCE per forward in XLA, symmetric per output
    channel, shipped int8 + f32 scales;
  - activations quantized dynamically in VMEM: per row for the two
    channel projections, per token column for the spatial projection;
  - LayerNorms, GELU (hardware-tanh form), the multiplicative gate,
    biases, residual and dequant epilogues stay f32 on the VPU.

Eval-only (W8A8 rounding has zero gradient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mixer_block import _gelu_tanh, _ln
from .mixer_block_int8 import _idot, _quant_act, _quant_w


def _kernel_int8(x_ref, ln1w, ln1b, qw1t, sw1, b1, sgu_w, sgu_b,
                 qwsp, swsp, bs, qw2t, sw2, b2, out_ref, *, bt, d_ffn):
    dtype = x_ref.dtype
    N = x_ref.shape[1]
    Np = qwsp.shape[1]
    D = x_ref.shape[2]
    x = x_ref[:]  # (bt, N, D)
    xn = _ln(x.reshape(bt * N, D), ln1w[:], ln1b[:])  # f32
    qxn, sxn = _quant_act(xn, axis=1)  # (M, 1)
    y = _idot(qxn, qw1t[:]).astype(jnp.float32) * sxn * sw1[:]
    y = _gelu_tanh(y + b1[:].astype(jnp.float32))  # (bt*N, 2f) f32
    u = y[:, :d_ffn]
    v = y[:, d_ffn:]
    vn = _ln(v, sgu_w[:], sgu_b[:]).reshape(bt, N, d_ffn)  # f32
    outs = []
    for i in range(bt):
        vi = jnp.pad(vn[i], ((0, Np - N), (0, 0)))
        qv, sv = _quant_act(vi, axis=0)  # per column f
        v2 = _idot(qwsp[:], qv).astype(jnp.float32) * swsp[:] * sv
        outs.append(v2 + bs[:].astype(jnp.float32)[:, None])
    v2 = jnp.concatenate(outs, axis=0)  # (bt*N, f) f32
    g = u * v2
    qg, sg = _quant_act(g, axis=1)
    h = _idot(qg, qw2t[:]).astype(jnp.float32) * sg * sw2[:]
    h = h + b2[:].astype(jnp.float32)
    out_ref[:] = (x.astype(jnp.float32).reshape(bt * N, D) + h).reshape(
        bt, N, D
    ).astype(dtype)


@functools.partial(jax.jit, static_argnames=("bt",))
def fused_gmlp_block_int8(x, ln1w, ln1b, w1, b1, sgu_w, sgu_b, wsp, bs,
                          w2, b2, bt=2):
    """Same signature/layouts as gmlp_block.fused_gmlp_block; weights
    quantized here (hoisted out of the per-tile grid), activations inside
    the kernel."""
    B, N, D = x.shape
    assert B % bt == 0, (B, bt)
    f2 = w1.shape[0]
    d_ffn = f2 // 2
    Np = -(-N // 128) * 128
    qw1, sw1 = _quant_w(w1, axis=1)    # (2f, D), scales (2f, 1)
    qwsp, swsp = _quant_w(wsp, axis=1)  # (N, N), scales (N, 1)
    qw2, sw2 = _quant_w(w2, axis=1)    # (D, f), scales (D, 1)
    # quantize in torch layouts, THEN pad: zero columns stay zero in int8
    qwsp = jnp.pad(qwsp, ((0, 0), (0, Np - N)))
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((bt, N, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_int8, bt=bt, d_ffn=d_ffn),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(B // bt,),
        in_specs=[tile, *[vec] * 13],
        out_specs=tile,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (D * f2 + N * d_ffn + d_ffn * D),
            bytes_accessed=2 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * f2,
        ),
    )(x, ln1w, ln1b, qw1.T, sw1.T, b1, sgu_w, sgu_b, qwsp, swsp, bs,
      qw2.T, sw2.T, b2)
