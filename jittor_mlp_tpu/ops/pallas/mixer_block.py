"""Fused MLP-Mixer block as a Pallas TPU kernel.

One kernel computes a full mixer block (mlp_mixer.py:35-40 semantics):

    h = x + W2·gelu(W1·LN1(x) + b1) + b2        (token mix, per image)
    y = h + gelu(LN2(h)·Wc1 + bc1)·Wc2 + bc2    (channel mix)

keeping the activation tile and all four weight matrices resident in VMEM, so
HBM sees exactly one read and one write of the (B, N, D) activation per block
instead of ~10 (LN stats, matmul operands, GELU, residuals). The MXU does all
four matmuls back-to-back with f32 accumulation; LayerNorm stats are f32 on
the VPU.

Used by the bf16 benchmark path of MLPMixerForImageClassification; the plain
jnp path remains the reference for parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(z):
    """Abramowitz & Stegun 7.1.26 polynomial erf, |error| < 1.5e-7 (f32).
    Mosaic has no erf/erfc primitive; this keeps the fused kernel's GELU
    faithful to the exact formulation well below bf16 resolution."""
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu(x):
    """Exact-erf GELU on f32 inputs."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_tanh(x):
    """Hendrycks tanh-form GELU (|error vs exact| < 5e-4).

    The TPU VPU has hardware tanh but no erf; the exact-erf polynomial costs
    an exp. Measured on-chip (tools/kernel_lab.py, Mixer-B/16 stack): exact
    5262 img/s → tanh 6362 (+21%), while end-to-end bf16 logits move from
    2.80e-3 to 2.90e-3 max-abs vs the f32 forward — the approximation error
    is buried an order of magnitude under bf16 rounding noise. Used for bf16
    kernel inputs only; f32 (parity-tested) keeps exact erf."""
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))


def _act_for(dtype):
    return _gelu if dtype == jnp.float32 else _gelu_tanh


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


def _kernel(
    x_ref,
    ln1w_ref, ln1b_ref, wt1_ref, bt1_ref, wt2_ref, bt2_ref,
    ln2w_ref, ln2b_ref, wc1t_ref, bc1_ref, wc2t_ref, bc2_ref,
    out_ref,
    h_scr,
    *, bt,
):
    """Token mixes run per image with the contraction axis zero-padded to a
    lane multiple (wt1/wt2 arrive pre-padded, exact semantics); channel mixes
    run once over all bt images stacked (M = bt·N) for MXU efficiency."""
    dtype = x_ref.dtype
    act = _act_for(dtype)
    N = x_ref.shape[1]
    Np = wt1_ref.shape[1]  # padded token count
    for i in range(bt):
        x = x_ref[i]  # (N, D)
        xn = _ln(x, ln1w_ref[:], ln1b_ref[:]).astype(dtype)
        xn = jnp.pad(xn, ((0, Np - N), (0, 0)))
        # token mix: (TD, Np) @ (Np, D) -> (TD, D); back (Np, TD)·... -> (Np, D)
        t = jnp.dot(wt1_ref[:], xn, preferred_element_type=jnp.float32)
        t = act(t + bt1_ref[:].astype(jnp.float32)[:, None]).astype(dtype)
        t2 = jnp.dot(wt2_ref[:], t, preferred_element_type=jnp.float32)[:N]
        h = x.astype(jnp.float32) + t2 + bt2_ref[:].astype(jnp.float32)[:, None]
        h_scr[i] = h.astype(dtype)
    # channel mix over all images at once: (bt*N, D) @ (D, CD) @ (CD, D)
    hn = _ln(
        h_scr[:].reshape(bt * N, -1), ln2w_ref[:], ln2b_ref[:]
    ).astype(dtype)
    c = jnp.dot(hn, wc1t_ref[:], preferred_element_type=jnp.float32)
    c = act(c + bc1_ref[:].astype(jnp.float32)).astype(dtype)
    c2 = jnp.dot(c, wc2t_ref[:], preferred_element_type=jnp.float32)
    c2 = c2 + bc2_ref[:].astype(jnp.float32)
    out_ref[:] = (
        h_scr[:].astype(jnp.float32) + c2.reshape(bt, N, -1)
    ).astype(dtype)


def _plain_block(x, ln1w, ln1b, wt1, bt1, wt2, bt2, ln2w, ln2b, wc1, bc1,
                 wc2, bc2):
    """jnp reference of the same math; used as the VJP of the fused kernel.
    Activation matches the kernel's per-dtype choice (_act_for): bf16 uses
    the tanh form, so the backward differentiates the function the forward
    actually computed (and skips XLA's 6×-bandwidth exact erf)."""
    act = _act_for(x.dtype)

    def ln(x, w, b, eps=1e-5):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        return ((y * w + b)).astype(x.dtype)

    y = jnp.einsum("oi,bid->bod", wt1, ln(x, ln1w, ln1b)) + bt1[None, :, None]
    y = act(y.astype(jnp.float32)).astype(x.dtype)
    h = x + jnp.einsum("oi,bid->bod", wt2, y) + bt2[None, :, None]
    c = jnp.matmul(ln(h, ln2w, ln2b), wc1.T) + bc1
    c = act(c.astype(jnp.float32)).astype(x.dtype)
    return h + jnp.matmul(c, wc2.T) + bc2


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_mixer_block_trainable(bt, x, ln1w, ln1b, wt1, bt1, wt2, bt2,
                                ln2w, ln2b, wc1, bc1, wc2, bc2):
    """Differentiable fused block: Pallas forward, XLA backward (the VJP of
    the identical jnp formulation — same math, standard-precision grads).
    ``bt`` (batch tile) is the leading static arg."""
    return fused_mixer_block(x, ln1w, ln1b, wt1, bt1, wt2, bt2,
                             ln2w, ln2b, wc1, bc1, wc2, bc2, bt=bt)


def _ftrain_fwd(bt, x, *w):
    out = fused_mixer_block(x, *w, bt=bt)
    return out, (x, w)


def _ftrain_bwd(bt, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x, *w: _plain_block(x, *w), x, *w)
    return vjp(g)


fused_mixer_block_trainable.defvjp(_ftrain_fwd, _ftrain_bwd)


@functools.partial(jax.jit, static_argnames=("bt",))
def fused_mixer_block(x, ln1w, ln1b, wt1, bt1, wt2, bt2,
                      ln2w, ln2b, wc1, bc1, wc2, bc2, bt=4):
    """x: (B, N, D). Weight layouts are the torch ones: wt1 (TD, N),
    wt2 (N, TD), wc1 (CD, D), wc2 (D, CD') — channel weights are passed
    pre-transposed to (D, CD)/(CD, D) row-major friendly forms."""
    B, N, D = x.shape
    assert B % bt == 0, (B, bt)
    TD = wt1.shape[0]
    CD = wc1.shape[0]
    # zero-pad the token axis to a lane multiple: extra columns of wt1 multiply
    # zero-padded rows of LN(x) (contribute nothing); extra rows of wt2 are
    # sliced off in-kernel. Bit-exact with the unpadded matmuls.
    Np = -(-N // 128) * 128
    wt1p = jnp.pad(wt1, ((0, 0), (0, Np - N)))
    wt2p = jnp.pad(wt2, ((0, Np - N), (0, 0)))
    wc1t = wc1.T  # (D, CD)
    wc2t = wc2.T  # (CD, D)

    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * B * N * D * (2 * TD + 2 * CD)
    return pl.pallas_call(
        functools.partial(_kernel, bt=bt),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[vec] * 12,
        ],
        out_specs=pl.BlockSpec(
            (bt, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bt, N, D), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * (TD + CD),
        ),
    )(x, ln1w, ln1b, wt1p, bt1, wt2p, bt2, ln2w, ln2b, wc1t, bc1, wc2t, bc2)
