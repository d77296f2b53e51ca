"""Fused W8A8 int8 ResMLP block: serving at the MXU's 2× int8 rate.

Same block semantics as resmlp_block._kernel (reference:
/root/reference/models_pytorch/res_mlp.py:34-57), with every matmul an
int8×int8→int32 MXU contraction, following the recipe that took the Mixer
from 0.98× to 1.17× bf16 (ops/pallas/mixer_block_int8.py):

  - weights quantized ONCE per forward in XLA, symmetric per output
    channel (quant.py's scheme), shipped as int8 + f32 scale vectors;
  - activations quantized dynamically in VMEM (per token column for the
    token mix, per row — per (row, chunk) when the FF hidden axis is
    chunked — for the channel FF);
  - Affines, LayerScale, GELU (hardware-tanh form), biases, residuals and
    all dequant epilogues stay f32 on the VPU.

Eval-only, like every int8 path (W8A8 rounding has zero gradient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mixer_block import _gelu_tanh
from .mixer_block_int8 import _idot, _quant_act, _quant_w


def _kernel_int8(x_ref, a1, b1, g1, qwt, swt, btk, a2, b2, g2,
                 qw1t, sw1, c1, qw2t, sw2, c2, out_ref, *, bt, ck):
    dtype = x_ref.dtype
    N = x_ref.shape[1]
    D = x_ref.shape[2]
    Np = qwt.shape[1]
    F = qw1t.shape[1]
    x = x_ref[:]  # (bt, N, D)
    h = x.astype(jnp.float32) * a1[:].astype(jnp.float32) + b1[:].astype(
        jnp.float32
    )
    toks = []
    for i in range(bt):
        hi = jnp.pad(h[i], ((0, Np - N), (0, 0)))
        # token mix: (N, Np)int8 @ (Np, D)int8, act scales per column d
        qh, sh = _quant_act(hi, axis=0)
        t = _idot(qwt[:], qh).astype(jnp.float32)
        toks.append(t * swt[:] * sh + btk[:].astype(jnp.float32)[:, None])
    t = jnp.stack(toks)  # (bt, N, D) f32
    h = h + g1[:].astype(jnp.float32) * t
    h = h * a2[:].astype(jnp.float32) + b2[:].astype(jnp.float32)
    hb = h.reshape(bt * N, D)
    qhb, shb = _quant_act(hb, axis=1)  # (M, 1)
    acc = jnp.zeros((bt * N, D), jnp.float32)
    for k0 in range(0, F, ck):
        c = _idot(qhb, qw1t[:, k0:k0 + ck]).astype(jnp.float32)
        c = c * shb * sw1[:, k0:k0 + ck]
        c = _gelu_tanh(c + c1[:, k0:k0 + ck].astype(jnp.float32))
        qc, sc = _quant_act(c, axis=1)  # per-(row, chunk) scales
        c2v = _idot(qc, qw2t[k0:k0 + ck, :]).astype(jnp.float32)
        acc = acc + c2v * sc * sw2[:]
    acc = acc + c2[:].astype(jnp.float32)
    out = hb + g2[:].astype(jnp.float32) * acc
    out_ref[:] = out.reshape(bt, N, D).astype(dtype)


@functools.partial(jax.jit, static_argnames=("bt",))
def fused_resmlp_block_int8(x, alpha1, beta1, gamma1, wt, bt_tok, alpha2,
                            beta2, gamma2, w1, c1, w2, c2, bt=2):
    """Same signature/layouts as resmlp_block.fused_resmlp_block; weights
    quantized here (hoisted out of the per-tile grid by XLA), activations
    inside the kernel."""
    B, N, D = x.shape
    assert B % bt == 0, (B, bt)
    F = w1.shape[0]
    Np = -(-N // 128) * 128
    qwt, swt = _quant_w(wt, axis=1)  # (N, N), scales (N, 1)
    qw1, sw1 = _quant_w(w1, axis=1)  # (F, D), scales (F, 1)
    qw2, sw2 = _quant_w(w2, axis=1)  # (D, F), scales (D, 1)
    # quantize in torch layouts, THEN pad: zero columns stay zero in int8
    qwt = jnp.pad(qwt, ((0, 0), (0, Np - N)))
    ck = F // 4 if F % 4 == 0 and F >= 2048 else F
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((bt, N, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_int8, bt=bt, ck=ck),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(B // bt,),
        in_specs=[tile, *[vec] * 15],
        out_specs=tile,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (N * D + 2 * D * F),
            bytes_accessed=2 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * F,
        ),
    )(x, alpha1, beta1, gamma1, qwt, swt, bt_tok, alpha2, beta2, gamma2,
      qw1.T, sw1.T, c1.reshape(1, F), qw2.T, sw2.T, c2)
