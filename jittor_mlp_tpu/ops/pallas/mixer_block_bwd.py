"""Fused Pallas BACKWARD for the MLP-Mixer block: training at kernel speed.

The round-2 trainable path (`mixer_block.fused_mixer_block_trainable`) runs
the Pallas forward and then, inside its VJP, re-executes the ENTIRE block as
plain XLA (jax.vjp of `_plain_block`) — so a train step pays
1×fused-forward + 1×plain-forward + 2×plain-backward of matmul work, with
the plain passes at unfused-XLA efficiency. This module replaces the VJP
with three Pallas kernels that keep the whole backward at fused efficiency:

  fwd   — the round-2 forward kernel, additionally emitting the channel-mix
          input ``h`` (one extra HBM write) so the backward never re-runs
          the token mix;
  TB    — token backward: per batch tile, recompute LN1/act from ``x`` in
          VMEM, produce dx and accumulate dwt1/dwt2/dbt1/dLN1 in f32
          accumulators resident across the (sequential) grid;
  CB-d  — channel data backward: full wc1/wc2 resident (bf16), chunked over
          the hidden axis so live f32 temporaries fit VMEM; produces dh and
          the LN2 grads;
  CB-w  — channel weight backward: grid (hidden-chunk, batch-tile) with the
          chunk OUTER so the (D, ck)/(ck, D) f32 weight-grad accumulators
          see only consecutive revisits; produces dwc1/dwc2/dbc1 directly in
          the torch layouts (no host-side transposes).

Weight-grad layouts match the torch ones (wt1 (TD,N), wt2 (N,TD),
wc1 (CD,D), wc2 (D,CD)); biases dbt2/dbc2 are plain XLA reductions of
already-materialized tensors. All accumulation is f32; grads are cast back
to the primal dtypes at the wrapper.

Semantics mirror mixer_block._plain_block exactly (erf-GELU in f32,
hardware-tanh GELU in bf16 — the backward differentiates the function the
forward actually computed). Cites /root/reference/models_pytorch/
mlp_mixer.py:30-45 for the block being differentiated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mixer_block import _act_for, _gelu, _gelu_tanh, fused_mixer_block


def _act_grad_for(dtype):
    return _gelu_grad if dtype == jnp.float32 else _gelu_tanh_grad


_SQRT_2_OVER_PI = 0.7978845608028654
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_grad(x):
    """d/dx of the exact-erf GELU: Phi(x) + x*phi(x), f32."""
    phi = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
    big_phi = _gelu(x) / jnp.where(x == 0.0, 1.0, x)  # 0.5*(1+erf(x/sqrt2))
    # avoid the 0/0 at x == 0 where Phi = 0.5 exactly
    big_phi = jnp.where(x == 0.0, 0.5, big_phi)
    return big_phi + x * phi


def _gelu_tanh_grad(x):
    """d/dx of the Hendrycks tanh-form GELU (matches _gelu_tanh)."""
    u = _SQRT_2_OVER_PI * (x + 0.044715 * x * x * x)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * 0.044715 * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _ln_fwd_stats(x):
    """f32 LN stats: (x_hat, inv_sigma); x is any dtype, stats f32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-5)
    return (xf - mu) * inv, inv


def _ln_bwd(dxn, xhat, inv, w):
    """LN input-grad given upstream dxn, normalized xhat, inv sigma, scale w."""
    dy = dxn * w.astype(jnp.float32)
    m1 = jnp.mean(dy, axis=-1, keepdims=True)
    m2 = jnp.mean(dy * xhat, axis=-1, keepdims=True)
    return inv * (dy - m1 - xhat * m2)


# ---------------------------------------------------------------------------
# forward emitting h (the channel-mix input) as a second output
# ---------------------------------------------------------------------------


def _fwd_kernel(
    x_ref,
    ln1w_ref, ln1b_ref, wt1_ref, bt1_ref, wt2_ref, bt2_ref,
    ln2w_ref, ln2b_ref, wc1t_ref, bc1_ref, wc2t_ref, bc2_ref,
    out_ref, h_ref,
    *, bt,
):
    dtype = x_ref.dtype
    act = _act_for(dtype)
    N = x_ref.shape[1]
    Np = wt1_ref.shape[1]
    for i in range(bt):
        x = x_ref[i]
        xhat, _ = _ln_fwd_stats(x)
        xn = (xhat * ln1w_ref[:].astype(jnp.float32)
              + ln1b_ref[:].astype(jnp.float32)).astype(dtype)
        xn = jnp.pad(xn, ((0, Np - N), (0, 0)))
        t = jnp.dot(wt1_ref[:], xn, preferred_element_type=jnp.float32)
        t = act(t + bt1_ref[:].astype(jnp.float32)[:, None]).astype(dtype)
        t2 = jnp.dot(wt2_ref[:], t, preferred_element_type=jnp.float32)[:N]
        h = x.astype(jnp.float32) + t2 + bt2_ref[:].astype(jnp.float32)[:, None]
        h_ref[i] = h.astype(dtype)
    hn, _ = _ln_fwd_stats(h_ref[:].reshape(bt * N, -1))
    hn = (hn * ln2w_ref[:].astype(jnp.float32)
          + ln2b_ref[:].astype(jnp.float32)).astype(dtype)
    c = jnp.dot(hn, wc1t_ref[:], preferred_element_type=jnp.float32)
    c = act(c + bc1_ref[:].astype(jnp.float32)).astype(dtype)
    c2 = jnp.dot(c, wc2t_ref[:], preferred_element_type=jnp.float32)
    c2 = c2 + bc2_ref[:].astype(jnp.float32)
    out_ref[:] = (
        h_ref[:].astype(jnp.float32).reshape(bt * N, -1) + c2
    ).reshape(bt, N, -1).astype(dtype)


@functools.partial(jax.jit, static_argnames=("bt",))
def _fwd_with_h(x, ln1w, ln1b, wt1, bt1, wt2, bt2, ln2w, ln2b, wc1, bc1,
                wc2, bc2, bt=2):
    B, N, D = x.shape
    assert B % bt == 0, (B, bt)
    TD, CD = wt1.shape[0], wc1.shape[0]
    Np = -(-N // 128) * 128
    wt1p = jnp.pad(wt1, ((0, 0), (0, Np - N)))
    wt2p = jnp.pad(wt2, ((0, Np - N), (0, 0)))
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((bt, N, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    flops = 2 * B * N * D * (2 * TD + 2 * CD)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bt=bt),
        out_shape=(jax.ShapeDtypeStruct((B, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, N, D), x.dtype)),
        grid=(B // bt,),
        in_specs=[tile, *[vec] * 12],
        out_specs=(tile, tile),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * (TD + CD),
        ),
    )(x, ln1w, ln1b, wt1p, bt1, wt2p, bt2, ln2w, ln2b, wc1.T, bc1, wc2.T,
      bc2)


# ---------------------------------------------------------------------------
# token backward
# ---------------------------------------------------------------------------


def _token_bwd_kernel(
    x_ref, dh_ref,
    ln1w_ref, ln1b_ref, wt1_ref, bt1_ref, wt2_ref,
    dx_ref, dwt1_ref, dwt2_ref, dbt1_ref, dln1w_ref, dln1b_ref,
    *, bt,
):
    dtype = x_ref.dtype
    act = _act_for(dtype)
    act_grad = _act_grad_for(dtype)
    N = x_ref.shape[1]
    Np = wt1_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwt1_ref[:] = jnp.zeros_like(dwt1_ref)
        dwt2_ref[:] = jnp.zeros_like(dwt2_ref)
        dbt1_ref[:] = jnp.zeros_like(dbt1_ref)
        dln1w_ref[:] = jnp.zeros_like(dln1w_ref)
        dln1b_ref[:] = jnp.zeros_like(dln1b_ref)

    for i in range(bt):
        x = x_ref[i]
        dh = dh_ref[i].astype(jnp.float32)
        # recompute the token forward
        xhat, inv = _ln_fwd_stats(x)
        xn = (xhat * ln1w_ref[:].astype(jnp.float32)
              + ln1b_ref[:].astype(jnp.float32)).astype(dtype)
        xn_p = jnp.pad(xn, ((0, Np - N), (0, 0)))
        tp = jnp.dot(wt1_ref[:], xn_p, preferred_element_type=jnp.float32)
        tp = tp + bt1_ref[:].astype(jnp.float32)[:, None]
        t = act(tp).astype(dtype)
        # backward
        dh_p = jnp.pad(dh.astype(dtype), ((0, Np - N), (0, 0)))
        dwt2_ref[:] += jax.lax.dot_general(
            dh_p, t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dt = jax.lax.dot_general(
            wt2_ref[:], dh_p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dtp = dt * act_grad(tp)
        dbt1_ref[:] += jnp.sum(dtp, axis=1, keepdims=True)
        dtp = dtp.astype(dtype)
        dwt1_ref[:] += jax.lax.dot_general(
            dtp, xn_p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dxn = jax.lax.dot_general(
            wt1_ref[:], dtp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:N]
        dln1w_ref[:] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
        dln1b_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
        dx = dh + _ln_bwd(dxn, xhat, inv, ln1w_ref[:])
        dx_ref[i] = dx.astype(dtype)


def _token_bwd(x, dh, ln1w, ln1b, wt1, bt1, wt2, bt=2):
    B, N, D = x.shape
    TD = wt1.shape[0]
    Np = -(-N // 128) * 128
    wt1p = jnp.pad(wt1, ((0, 0), (0, Np - N)))
    wt2p = jnp.pad(wt2, ((0, Np - N), (0, 0)))
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((bt, N, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    acc = pl.BlockSpec(memory_space=pltpu.VMEM)
    dx, dwt1p, dwt2p, dbt1, dln1w, dln1b = pl.pallas_call(
        functools.partial(_token_bwd_kernel, bt=bt),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((TD, Np), jnp.float32),
            jax.ShapeDtypeStruct((Np, TD), jnp.float32),
            jax.ShapeDtypeStruct((TD, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        grid=(B // bt,),
        in_specs=[tile, tile, *[vec] * 5],
        out_specs=(tile, acc, acc, acc, acc, acc),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * 5 * TD,
            bytes_accessed=3 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * 2 * TD,
        ),
    )(x, dh, ln1w, ln1b, wt1p, bt1, wt2p)
    return (dx, dwt1p[:, :N], dwt2p[:N], dbt1[:, 0], dln1w[0], dln1b[0])


# ---------------------------------------------------------------------------
# channel backward — data grad (dh) + LN2 grads
# ---------------------------------------------------------------------------


def _chan_data_kernel(
    h_ref, g_ref, ln2w_ref, ln2b_ref, bc1k_ref, wc1tk_ref, wc2tk_ref,
    dh_ref, dln2w_ref, dln2b_ref, dhn_ref,
    *, bt, nk,
):
    dtype = h_ref.dtype
    act_grad = _act_grad_for(dtype)
    N = h_ref.shape[1]
    D = h_ref.shape[2]
    M = bt * N
    k = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (k == 0))
    def _():
        dln2w_ref[:] = jnp.zeros_like(dln2w_ref)
        dln2b_ref[:] = jnp.zeros_like(dln2b_ref)

    @pl.when(k == 0)
    def _():
        dhn_ref[:] = jnp.zeros_like(dhn_ref)

    # LN stats are recomputed per hidden chunk — two VPU reductions, noise
    # next to the chunk's three (M, D)×(D, ck) matmuls.
    h = h_ref[:].reshape(M, D)
    g = g_ref[:].reshape(M, D).astype(dtype)
    xhat, inv = _ln_fwd_stats(h)
    hn = (xhat * ln2w_ref[:].astype(jnp.float32)
          + ln2b_ref[:].astype(jnp.float32)).astype(dtype)
    cp = jnp.dot(hn, wc1tk_ref[:], preferred_element_type=jnp.float32)
    cp = cp + bc1k_ref[0].astype(jnp.float32)
    dc = jax.lax.dot_general(
        g, wc2tk_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dcp = (dc * act_grad(cp)).astype(dtype)
    dhn_ref[:] += jax.lax.dot_general(
        dcp, wc1tk_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        dhn = dhn_ref[:]
        dln2w_ref[:] += jnp.sum(dhn * xhat, axis=0, keepdims=True)
        dln2b_ref[:] += jnp.sum(dhn, axis=0, keepdims=True)
        dh = g.astype(jnp.float32) + _ln_bwd(dhn, xhat, inv, ln2w_ref[:])
        dh_ref[:] = dh.reshape(bt, N, D).astype(dtype)


def _chan_data_bwd(h, g, ln2w, ln2b, bc1, wc1, wc2, bt=2, ck=None):
    B, N, D = h.shape
    CD = wc1.shape[0]
    ck = ck or (CD // 4 if CD % 4 == 0 and CD >= 2048 else CD)
    assert CD % ck == 0
    nk = CD // ck
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((bt, N, D), lambda b, k: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    acc = pl.BlockSpec(memory_space=pltpu.VMEM)
    dh, dln2w, dln2b = pl.pallas_call(
        functools.partial(_chan_data_kernel, bt=bt, nk=nk),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), h.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        # hidden chunk INNER so the dhn scratch accumulates over consecutive
        # k revisits of one batch tile; weights stream chunk-by-chunk so the
        # kernel never holds both full (D, CD) matrices in VMEM (that layout
        # blew the 16M scoped-vmem limit at D=768, CD=3072).
        grid=(B // bt, nk),
        in_specs=[
            tile, tile, vec, vec,
            pl.BlockSpec((1, ck), lambda b, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, ck), lambda b, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ck, D), lambda b, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(tile, acc, acc),
        scratch_shapes=[pltpu.VMEM((bt * N, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * 3 * CD,
            bytes_accessed=3 * B * N * D * h.dtype.itemsize,
            transcendentals=B * N * CD,
        ),
    )(h, g, ln2w, ln2b, bc1.reshape(1, CD), wc1.T, wc2.T)
    return dh, dln2w[0], dln2b[0]


# ---------------------------------------------------------------------------
# channel backward — weight grads, chunk-outer grid
# ---------------------------------------------------------------------------


def _chan_wgt_kernel(
    h_ref, g_ref, ln2w_ref, ln2b_ref, bc1k_ref, wc1tk_ref, wc2tk_ref,
    dwc1k_ref, dwc2k_ref, dbc1k_ref,
    *, bt,
):
    dtype = h_ref.dtype
    act = _act_for(dtype)
    act_grad = _act_grad_for(dtype)
    N, D = h_ref.shape[1], h_ref.shape[2]
    M = bt * N

    @pl.when(pl.program_id(1) == 0)
    def _():
        dwc1k_ref[:] = jnp.zeros_like(dwc1k_ref)
        dwc2k_ref[:] = jnp.zeros_like(dwc2k_ref)
        dbc1k_ref[:] = jnp.zeros_like(dbc1k_ref)

    h = h_ref[:].reshape(M, D)
    g = g_ref[:].reshape(M, D).astype(dtype)
    xhat, _ = _ln_fwd_stats(h)
    hn = (xhat * ln2w_ref[:].astype(jnp.float32)
          + ln2b_ref[:].astype(jnp.float32)).astype(dtype)
    cp = jnp.dot(hn, wc1tk_ref[:], preferred_element_type=jnp.float32)
    cp = cp + bc1k_ref[0].astype(jnp.float32)
    c = act(cp).astype(dtype)
    dc = jax.lax.dot_general(
        g, wc2tk_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dcp = dc * act_grad(cp)
    dbc1k_ref[:] += jnp.sum(dcp, axis=0, keepdims=True)
    dcp = dcp.astype(dtype)
    # dwc1 chunk directly in the torch (CD, D) layout
    dwc1k_ref[:] += jax.lax.dot_general(
        dcp, hn, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dwc2 chunk directly in the torch (D, CD) layout
    dwc2k_ref[:] += jax.lax.dot_general(
        g, c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _chan_wgt_bwd(h, g, ln2w, ln2b, bc1, wc1, wc2, bt=2, ck=None):
    B, N, D = h.shape
    CD = wc1.shape[0]
    ck = ck or (CD // 4 if CD % 4 == 0 and CD >= 2048 else CD)
    assert CD % ck == 0
    K = CD // ck
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((bt, N, D), lambda k, b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    dwc1, dwc2, dbc1 = pl.pallas_call(
        functools.partial(_chan_wgt_kernel, bt=bt),
        out_shape=(
            jax.ShapeDtypeStruct((CD, D), jnp.float32),
            jax.ShapeDtypeStruct((D, CD), jnp.float32),
            jax.ShapeDtypeStruct((1, CD), jnp.float32),
        ),
        grid=(K, B // bt),
        in_specs=[
            tile, tile, vec, vec,
            # bc1 ships as (1, CD): 1-D operands tile at (1024,)/(2048,)
            # granularity, which a 768-wide chunk cannot divide
            pl.BlockSpec((1, ck), lambda k, b: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, ck), lambda k, b: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ck, D), lambda k, b: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ck, D), lambda k, b: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, ck), lambda k, b: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ck), lambda k, b: (0, k),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * 4 * CD,
            bytes_accessed=2 * K * B * N * D * h.dtype.itemsize,
            transcendentals=B * N * CD * K,
        ),
    )(h, g, ln2w, ln2b, bc1.reshape(1, CD), wc1.T, wc2.T)
    return dwc1, dwc2, dbc1[0]


# ---------------------------------------------------------------------------
# the trainable block: Pallas forward AND Pallas backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_mixer_block_train(bt, x, ln1w, ln1b, wt1, bt1, wt2, bt2,
                            ln2w, ln2b, wc1, bc1, wc2, bc2):
    """Differentiable fused mixer block with a fused Pallas backward.

    Same signature/semantics as mixer_block.fused_mixer_block_trainable,
    but the VJP runs three Pallas kernels (token bwd, channel data bwd,
    channel weight bwd) instead of re-running the block as plain XLA —
    see the module docstring for the measured motivation."""
    return fused_mixer_block(x, ln1w, ln1b, wt1, bt1, wt2, bt2,
                             ln2w, ln2b, wc1, bc1, wc2, bc2, bt=bt)


def _train_fwd(bt, x, ln1w, ln1b, wt1, bt1, wt2, bt2, ln2w, ln2b, wc1, bc1,
               wc2, bc2):
    y, h = _fwd_with_h(x, ln1w, ln1b, wt1, bt1, wt2, bt2, ln2w, ln2b,
                       wc1, bc1, wc2, bc2, bt=bt)
    return y, (x, h, ln1w, ln1b, wt1, bt1, wt2, ln2w, ln2b, wc1, bc1, wc2)


def _train_bwd(bt, res, g):
    x, h, ln1w, ln1b, wt1, bt1, wt2, ln2w, ln2b, wc1, bc1, wc2 = res
    dh, dln2w, dln2b = _chan_data_bwd(h, g, ln2w, ln2b, bc1, wc1, wc2, bt=bt)
    dwc1, dwc2, dbc1 = _chan_wgt_bwd(h, g, ln2w, ln2b, bc1, wc1, wc2, bt=bt)
    dbc2 = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
    dx, dwt1, dwt2, dbt1, dln1w, dln1b = _token_bwd(
        x, dh, ln1w, ln1b, wt1, bt1, wt2, bt=bt
    )
    dbt2 = jnp.sum(dh.astype(jnp.float32), axis=(0, 2))

    def cast(v, like):
        return v.astype(like.dtype)

    return (cast(dx, x), cast(dln1w, ln1w), cast(dln1b, ln1b),
            cast(dwt1, wt1), cast(dbt1, bt1), cast(dwt2, wt2),
            cast(dbt2, x), cast(dln2w, ln2w), cast(dln2b, ln2b),
            cast(dwc1, wc1), cast(dbc1, bc1), cast(dwc2, wc2),
            cast(dbc2, x))


fused_mixer_block_train.defvjp(_train_fwd, _train_bwd)
