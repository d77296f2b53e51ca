"""Fused ResMLP block as a Pallas TPU kernel.

One kernel computes a full ResMLP block (res_mlp.py:34-57 semantics):

    h  = x ⊙ α₁ + β₁                          pre-Affine
    h += γ₁ ⊙ (W_t·h + b_t)                    token mix (LayerScale γ₁)
    h  = h ⊙ α₂ + β₂                          post-Affine
    h += γ₂ ⊙ (gelu(h Wᵀ₁ + c₁) Wᵀ₂ + c₂)      channel FF (LayerScale γ₂)

Channel FF matmuls batch across the image tile; the token mix runs per image
with its contraction axis zero-padded to lane width (exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mixer_block import _act_for


def _kernel(x_ref, a1, b1, g1, wt, btk, a2, b2, g2, w1t, c1, w2t, c2,
            out_ref, *, bt):
    dtype = x_ref.dtype
    act = _act_for(dtype)
    N = x_ref.shape[1]
    Np = wt.shape[1]
    D = x_ref.shape[2]
    x = x_ref[:]  # (bt, N, D)
    h = (x.astype(jnp.float32) * a1[:].astype(jnp.float32)
         + b1[:].astype(jnp.float32)).astype(dtype)
    toks = []
    for i in range(bt):
        hi = jnp.pad(h[i], ((0, Np - N), (0, 0)))
        t = jnp.dot(wt[:], hi, preferred_element_type=jnp.float32)[:N]
        toks.append(t + btk[:].astype(jnp.float32)[:, None])
    t = jnp.stack(toks)  # (bt, N, D) f32
    h = h.astype(jnp.float32) + g1[:].astype(jnp.float32) * t
    h = h * a2[:].astype(jnp.float32) + b2[:].astype(jnp.float32)
    hb = h.astype(dtype).reshape(bt * N, D)
    c = jnp.dot(hb, w1t[:], preferred_element_type=jnp.float32)
    c = act(c + c1[:].astype(jnp.float32)).astype(dtype)
    f = jnp.dot(c, w2t[:], preferred_element_type=jnp.float32)
    f = f + c2[:].astype(jnp.float32)
    out = h + g2[:].astype(jnp.float32) * f.reshape(bt, N, D)
    out_ref[:] = out.astype(dtype)


@functools.partial(jax.jit, static_argnames=("bt",))
def fused_resmlp_block(x, alpha1, beta1, gamma1, wt, bt_tok, alpha2, beta2,
                       gamma2, w1, c1, w2, c2, bt=2):
    """x: (B, N, D). torch layouts: wt (N, N) [token_mix conv1d squeezed],
    w1 (4D, D) / w2 (D, 4D) [ff.net]. Affines arrive flattened to (D,)."""
    B, N, D = x.shape
    assert B % bt == 0, (B, bt)
    Np = -(-N // 128) * 128
    wtp = jnp.pad(wt, ((0, 0), (0, Np - N)))
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    F = w1.shape[0]
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
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (N * D + 2 * D * F),
            bytes_accessed=2 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * F,
        ),
    )(x, alpha1, beta1, gamma1, wtp, bt_tok, alpha2, beta2, gamma2,
      w1.T, c1, w2.T, c2)


def _plain_resmlp_block(x, alpha1, beta1, gamma1, wt, bt_tok, alpha2, beta2,
                        gamma2, w1, c1, w2, c2):
    """jnp reference of the kernel's math with its per-dtype activation;
    used as the VJP of the fused kernel (Pallas forward, XLA backward)."""
    act = _act_for(x.dtype)
    h = (x.astype(jnp.float32) * alpha1 + beta1).astype(x.dtype)
    t = jnp.einsum("on,bnd->bod", wt, h) + bt_tok[None, :, None]
    h = h.astype(jnp.float32) + gamma1 * t.astype(jnp.float32)
    h = (h * alpha2 + beta2).astype(x.dtype)
    c = jnp.matmul(h, w1.T) + c1
    c = act(c.astype(jnp.float32)).astype(x.dtype)
    f = jnp.matmul(c, w2.T) + c2
    return (h.astype(jnp.float32) + gamma2 * f.astype(jnp.float32)).astype(
        x.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_resmlp_block_trainable(bt, x, alpha1, beta1, gamma1, wt, bt_tok,
                                 alpha2, beta2, gamma2, w1, c1, w2, c2):
    """Differentiable fused block: Pallas forward, XLA backward (the VJP of
    the identical jnp formulation)."""
    return fused_resmlp_block(x, alpha1, beta1, gamma1, wt, bt_tok, alpha2,
                              beta2, gamma2, w1, c1, w2, c2, bt=bt)


def _rtrain_fwd(bt, x, *w):
    return fused_resmlp_block(x, *w, bt=bt), (x, w)


def _rtrain_bwd(bt, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x, *w: _plain_resmlp_block(x, *w), x, *w)
    return vjp(g)


fused_resmlp_block_trainable.defvjp(_rtrain_fwd, _rtrain_bwd)
