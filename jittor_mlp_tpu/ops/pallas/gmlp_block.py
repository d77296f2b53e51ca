"""Fused gMLP block as a Pallas TPU kernel.

One kernel computes a full gMLP block (g_mlp.py:24-39 semantics):

    y      = gelu(LN1(x) @ W1ᵀ + b1)            channel expand to 2·ffn
    u, v   = split(y);  vn = LN2(v)
    v2     = Ws·vn + bs                          spatial (token) projection
    h      = x + (u ⊙ v2) @ W2ᵀ + b2             gate + project back

with the activation tile and all weights VMEM-resident. Channel matmuls batch
across the image tile; the token projection runs per image with its
contraction axis zero-padded to lane width (exact — extra columns multiply
zero-padded rows). Same dtype-dependent GELU as the mixer kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mixer_block import _act_for, _ln


def _kernel(x_ref, ln1w, ln1b, w1t, b1, sgu_w, sgu_b, wsp, bs, w2t, b2,
            out_ref, *, bt, d_ffn):
    dtype = x_ref.dtype
    act = _act_for(dtype)
    N = x_ref.shape[1]
    Np = wsp.shape[1]
    D = x_ref.shape[2]
    x = x_ref[:]  # (bt, N, D)
    xn = _ln(x.reshape(bt * N, D), ln1w[:], ln1b[:]).astype(dtype)
    y = jnp.dot(xn, w1t[:], preferred_element_type=jnp.float32)
    y = act(y + b1[:].astype(jnp.float32)).astype(dtype)  # (bt*N, 2f)
    u = y[:, :d_ffn]
    v = y[:, d_ffn:]
    vn = _ln(v, sgu_w[:], sgu_b[:]).astype(dtype).reshape(bt, N, d_ffn)
    outs = []
    for i in range(bt):
        vi = jnp.pad(vn[i], ((0, Np - N), (0, 0)))
        v2 = jnp.dot(wsp[:], vi, preferred_element_type=jnp.float32)[:N]
        outs.append(v2 + bs[:].astype(jnp.float32)[:, None])
    v2 = jnp.concatenate(outs, axis=0).astype(dtype)  # (bt*N, f)
    g = (u.astype(jnp.float32) * v2.astype(jnp.float32)).astype(dtype)
    h = jnp.dot(g, w2t[:], preferred_element_type=jnp.float32)
    h = h + b2[:].astype(jnp.float32)
    out_ref[:] = (x.astype(jnp.float32).reshape(bt * N, D) + h).reshape(
        bt, N, D
    ).astype(dtype)


@functools.partial(jax.jit, static_argnames=("bt",))
def fused_gmlp_block(x, ln1w, ln1b, w1, b1, sgu_w, sgu_b, wsp, bs, w2, b2,
                     bt=2):
    """x: (B, N, D). torch layouts: w1 (2f, D) [channel_proj1], wsp (N, N)
    [sgu.spatial_proj conv1d squeezed], w2 (D, f) [channel_proj2]."""
    B, N, D = x.shape
    assert B % bt == 0, (B, bt)
    f2 = w1.shape[0]
    d_ffn = f2 // 2
    Np = -(-N // 128) * 128
    wspp = jnp.pad(wsp, ((0, 0), (0, Np - N)))  # zero cols for padded tokens
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, bt=bt, d_ffn=d_ffn),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[vec] * 10,
        ],
        out_specs=pl.BlockSpec(
            (bt, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (D * f2 + N * d_ffn + d_ffn * D),
            bytes_accessed=2 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * f2,
        ),
    )(x, ln1w, ln1b, w1.T, b1, sgu_w, sgu_b, wspp, bs, w2.T, b2)


def _plain_gmlp_block(x, ln1w, ln1b, w1, b1, sgu_w, sgu_b, wsp, bs, w2, b2):
    """jnp reference of the kernel's math with its per-dtype activation;
    used as the VJP of the fused kernel (Pallas forward, XLA backward)."""
    act = _act_for(x.dtype)

    def ln(t, w, b, eps=1e-5):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, -1, keepdims=True)
        var = jnp.mean(jnp.square(tf - mu), -1, keepdims=True)
        y = (tf - mu) * jax.lax.rsqrt(var + eps)
        return (y * w + b).astype(t.dtype)

    d_ffn = w1.shape[0] // 2
    y = jnp.matmul(ln(x, ln1w, ln1b), w1.T) + b1
    y = act(y.astype(jnp.float32)).astype(x.dtype)
    u, v = y[..., :d_ffn], y[..., d_ffn:]
    vn = ln(v, sgu_w, sgu_b)
    v2 = jnp.einsum("on,bnf->bof", wsp, vn) + bs[None, :, None]
    g = (u.astype(jnp.float32) * v2.astype(jnp.float32)).astype(x.dtype)
    return x + jnp.matmul(g, w2.T) + b2


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_gmlp_block_trainable(bt, x, ln1w, ln1b, w1, b1, sgu_w, sgu_b,
                               wsp, bs, w2, b2):
    """Differentiable fused block: Pallas forward, XLA backward (the VJP of
    the identical jnp formulation)."""
    return fused_gmlp_block(x, ln1w, ln1b, w1, b1, sgu_w, sgu_b, wsp, bs,
                            w2, b2, bt=bt)


def _gtrain_fwd(bt, x, *w):
    return fused_gmlp_block(x, *w, bt=bt), (x, w)


def _gtrain_bwd(bt, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x, *w: _plain_gmlp_block(x, *w), x, *w)
    return vjp(g)


fused_gmlp_block_trainable.defvjp(_gtrain_fwd, _gtrain_bwd)
