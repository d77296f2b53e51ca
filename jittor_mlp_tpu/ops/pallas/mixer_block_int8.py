"""Fused W8A8 int8 MLP-Mixer block: serving at the MXU's 2× int8 rate.

The dynamic-int8 serving path (quant.dynamic_int8_matmul under
``config.int8_mode()``) measured 0.98× bf16 on Mixer-B/16: routing the
dense ops through int8 forfeits the fused Pallas block (round 2's +40%)
and re-quantizes the weights from bf16 on every forward, so the 2× MXU
int8 rate (measured: 346 TOP/s via XLA, 458 in-kernel, vs ~197 TF/s bf16
peak) never reaches the end-to-end number.

This kernel keeps the round-2 fusion AND the int8 contraction rate. Same
block semantics as mixer_block._kernel (reference:
/root/reference/models_pytorch/mlp_mixer.py:30-45), with every matmul an
int8×int8→int32 MXU contraction:

  - weights are quantized ONCE per forward in XLA, symmetric per output
    channel (absmax/127, exactly quant.py's scheme), and ship to the
    kernel as int8 + f32 scale vectors;
  - activations are quantized dynamically in VMEM: f32 absmax over the
    contracted axis (per token column for the two token mixes, per row
    for the two channel mixes), round, int8 — no calibration;
  - the channel pair is chunked over the 3072-wide hidden axis with
    per-(row, chunk) activation scales — finer than the XLA path's
    per-row scales (strictly lower quantization error) and the reason
    the live f32 temporaries fit scoped VMEM;
  - LayerNorms, GELU (hardware-tanh form, as on the bf16 path), biases,
    residuals, and all dequant epilogues are f32 on the VPU.

Eval-only, like every int8 path (the W8A8 rounding has zero gradient —
see config.int8_mode / make_train_step's guard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mixer_block import _gelu_tanh, _ln


def _quant_w(w, axis):
    """Symmetric per-output-channel int8 weight quantization (quant.py:116-121
    semantics): returns (int8 weights, f32 scales along ``axis``)."""
    wf = jnp.asarray(w, jnp.float32)
    aw = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    sw = jnp.where(aw > 0, aw / 127.0, 1.0)
    return jnp.round(wf / sw).astype(jnp.int8), sw


def _quant_act(xf, axis):
    """Dynamic symmetric activation quantization in f32 (in-kernel).

    One divide per row/column (the reciprocal), then a multiply per
    element — not a per-element divide; all-zero rows degenerate to
    scale 1e-30/127 with every quantized value 0, equivalent to the
    where-guard at one select pass less."""
    ax = jnp.maximum(jnp.max(jnp.abs(xf), axis=axis, keepdims=True), 1e-30)
    rs = 127.0 / ax
    return jnp.round(xf * rs).astype(jnp.int8), ax * (1.0 / 127.0)


def _idot(qa, qb):
    return jax.lax.dot_general(
        qa, qb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _kernel_int8(
    x_ref,
    ln1w_ref, ln1b_ref, qwt1_ref, swt1_ref, bt1_ref, qwt2_ref, swt2_ref,
    bt2_ref, ln2w_ref, ln2b_ref, qwc1t_ref, swc1_ref, bc1_ref,
    qwc2t_ref, swc2_ref, bc2_ref,
    out_ref,
    h_scr,
    *, bt, ck,
):
    dtype = x_ref.dtype
    N = x_ref.shape[1]
    D = x_ref.shape[2]
    Np = qwt1_ref.shape[1]
    CD = qwc1t_ref.shape[1]
    for i in range(bt):
        x = x_ref[i]  # (N, D)
        xn = _ln(x, ln1w_ref[:], ln1b_ref[:])  # f32
        xn = jnp.pad(xn, ((0, Np - N), (0, 0)))
        # token mix 1: (TD, Np)int8 @ (Np, D)int8; act scales per column d
        qxn, sxn = _quant_act(xn, axis=0)  # sxn (1, D)
        t = _idot(qwt1_ref[:], qxn).astype(jnp.float32)
        t = t * swt1_ref[:] * sxn  # (TD, D)
        t = _gelu_tanh(t + bt1_ref[:].astype(jnp.float32)[:, None])
        # token mix 2: (Np, TD) @ (TD, D); act scales per column d
        qt, st = _quant_act(t, axis=0)
        t2 = _idot(qwt2_ref[:], qt).astype(jnp.float32)[:N]
        t2 = t2 * swt2_ref[:N] * st
        h = x.astype(jnp.float32) + t2 + bt2_ref[:].astype(jnp.float32)[:, None]
        h_scr[i] = h.astype(dtype)
    # channel mixes over all bt images stacked, hidden axis chunked
    hn = _ln(h_scr[:].reshape(bt * N, D), ln2w_ref[:], ln2b_ref[:])
    qhn, shn = _quant_act(hn, axis=1)  # shn (M, 1)
    acc = jnp.zeros((bt * N, D), jnp.float32)
    for k0 in range(0, CD, ck):
        c = _idot(qhn, qwc1t_ref[:, k0:k0 + ck]).astype(jnp.float32)
        c = c * shn * swc1_ref[:, k0:k0 + ck]
        # bc1 ships as (1, CD): 1-D operands tile at coarse granularity a
        # 768-wide chunk cannot divide (same fix as mixer_block_bwd)
        c = _gelu_tanh(c + bc1_ref[:, k0:k0 + ck].astype(jnp.float32))
        # per-(row, chunk) scales: finer than the XLA path's per-row scheme
        qc, sc = _quant_act(c, axis=1)
        c2 = _idot(qc, qwc2t_ref[k0:k0 + ck, :]).astype(jnp.float32)
        acc = acc + c2 * sc * swc2_ref[:]
    acc = acc + bc2_ref[:].astype(jnp.float32)
    out_ref[:] = (
        h_scr[:].astype(jnp.float32).reshape(bt * N, D) + acc
    ).reshape(bt, N, D).astype(dtype)


@functools.partial(jax.jit, static_argnames=("bt",))
def fused_mixer_block_int8(x, ln1w, ln1b, wt1, bt1, wt2, bt2,
                           ln2w, ln2b, wc1, bc1, wc2, bc2, bt=2):
    """Same signature/layouts as mixer_block.fused_mixer_block; weights are
    quantized here (hoisted out of the per-tile grid by XLA), activations
    inside the kernel."""
    B, N, D = x.shape
    assert B % bt == 0, (B, bt)
    TD, CD = wt1.shape[0], wc1.shape[0]
    Np = -(-N // 128) * 128
    # quantize in torch layouts (per output channel = per contraction-free
    # row/col), THEN pad: zero columns/rows stay exactly zero in int8
    qwt1, swt1 = _quant_w(wt1, axis=1)           # (TD, N), scales (TD, 1)
    qwt2, swt2 = _quant_w(wt2, axis=1)           # (N, TD), scales (N, 1)
    qwc1, swc1 = _quant_w(wc1, axis=1)           # (CD, D), scales (CD, 1)
    qwc2, swc2 = _quant_w(wc2, axis=1)           # (D, CD), scales (D, 1)
    qwt1 = jnp.pad(qwt1, ((0, 0), (0, Np - N)))
    qwt2 = jnp.pad(qwt2, ((0, Np - N), (0, 0)))
    swt2 = jnp.pad(swt2, ((0, Np - N), (0, 0)), constant_values=1.0)
    ck = CD // 4 if CD % 4 == 0 and CD >= 2048 else CD
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((bt, N, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_int8, bt=bt, ck=ck),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(B // bt,),
        in_specs=[tile, *[vec] * 16],
        out_specs=tile,
        scratch_shapes=[pltpu.VMEM((bt, N, D), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * (2 * TD + 2 * CD),
            bytes_accessed=3 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * (TD + CD),
        ),
    )(x, ln1w, ln1b, qwt1, swt1, bt1, qwt2, swt2, bt2, ln2w, ln2b,
      qwc1.T, swc1.T, bc1.reshape(1, CD), qwc2.T, swc2.T, bc2)
