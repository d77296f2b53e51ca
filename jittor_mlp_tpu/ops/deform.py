"""Deformable 1x1 sampling ops, TPU-native lowerings.

Two tiers (SURVEY §2.3 items 2-5):

1. CycleFC (cycle_mlp.py:54-131): per-channel integer offsets cycling with
   period K along one axis, known at trace time → lowered to K zero-padded
   static shifts whose contributions are folded into K masked weight matrices,
   i.e. K plain MXU matmuls. No gather at all.

2. ATMOp (active_mlp.py:37-81): learned float offsets along one axis → 1-D
   bilinear interpolation expressed as a hat-function MXU contraction
   (_hat_sample_1d; ~140x faster than the equivalent TPU gather), then a 1x1
   matmul. _linear_sample_1d keeps the gather formulation as the reference
   oracle for tests.
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
        out = out + jnp.matmul(_shift_zero(x, axis, delta), wr.T,
                               precision=nnf._prec())
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


def deform_conv2d(x, offset, weight, bias=None, stride=(1, 1), padding=(0, 0),
                  dilation=(1, 1), mask=None):
    """General modulated deformable convolution (DCNv1/v2) on NHWC input.

    TPU-native equivalent of the reference's inline-CUDA DCNv2
    (models_jittor/utils/dcn_v2.py:66-332: modulated_deformable_im2col +
    batched GEMM) and torchvision's deform_conv2d. The bilinear im2col is
    expressed as four take_along_axis gathers per kernel tap with
    corner-validity zero masking, followed by one grouped MXU matmul; the
    backward pass (1.2k LoC of CUDA col2im/coord-grad kernels in the
    reference, dcn_v2.py:362-807) comes from JAX autodiff of this same
    formulation.

    x:      (B, H, W, Cin)
    offset: (B, Ho, Wo, 2*G*kh*kw)  — torch layout (Δy, Δx) interleaved per
            offset-group g and tap k: channel 2*(g*kh*kw+k)(+1)
    weight: (Cout, Cin//wg, kh, kw)  — torch OIHW
    mask:   (B, Ho, Wo, G*kh*kw) or None (DCNv2 modulation)
    """
    B, H, W, Cin = x.shape
    Cout, Cin_g, kh, kw = weight.shape
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    dh, dw = (dilation, dilation) if isinstance(dilation, int) else dilation
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    G = offset.shape[-1] // (2 * kh * kw)
    off = offset.reshape(B, Ho, Wo, G, kh * kw, 2)
    if mask is not None:
        msk = mask.reshape(B, Ho, Wo, G, kh * kw)

    ys = (jnp.arange(Ho) * sh - ph).astype(x.dtype)[None, :, None, None]
    xs = (jnp.arange(Wo) * sw - pw).astype(x.dtype)[None, None, :, None]
    xg = x.reshape(B, H, W, G, Cin // G)
    flat = xg.reshape(B, H * W, G, Cin // G)

    cols = []
    for k in range(kh * kw):
        i, j = divmod(k, kw)
        py = ys + i * dh + off[:, :, :, :, k, 0]  # (B,Ho,Wo,G)
        px = xs + j * dw + off[:, :, :, :, k, 1]
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        wy1 = (py - y0)[..., None]
        wx1 = (px - x0)[..., None]
        acc = 0.0
        for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
            for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
                yy = y0.astype(jnp.int32) + dy
                xx = x0.astype(jnp.int32) + dx
                valid = ((yy >= 0) & (yy < H) & (xx >= 0) & (xx < W))[..., None]
                idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
                v = jnp.take_along_axis(
                    flat, idx.reshape(B, -1, G, 1), axis=1
                ).reshape(B, Ho, Wo, G, Cin // G)
                acc = acc + jnp.where(valid, v, 0.0) * (wy * wx)
        if mask is not None:
            acc = acc * msk[:, :, :, :, k, None]
        cols.append(acc.reshape(B, Ho, Wo, Cin))
    # col channel index = c*(kh*kw) + k to match OIHW flattening
    col = jnp.stack(cols, axis=-1).reshape(B, Ho, Wo, Cin * kh * kw)
    wg = Cin // Cin_g
    wmat = weight.reshape(wg, Cout // wg, Cin_g * kh * kw)
    colg = col.reshape(B, Ho, Wo, wg, Cin_g * kh * kw)
    out = jnp.einsum("bhwgc,goc->bhwgo", colg, wmat,
                     precision=nnf._prec()).reshape(B, Ho, Wo, Cout)
    if bias is not None:
        out = out + bias
    return out


def _hat_sample_1d(x, offset, axis, share=1):
    """1-D bilinear sample as a hat-function matmul (no gather).

    out[..., i, ...] = Σ_j max(0, 1 − |i + off − j|) · x[..., j, ...]
    which is exactly linear interpolation with zero outside — but expressed as
    an MXU contraction instead of a per-element gather (~140x faster on TPU;
    gathers of this shape are pathological). ``share`` exploits ActiveMLP's
    repeat_interleaved offsets: one hat matrix per group of ``share`` channels
    (offsets must be contiguously repeated, which jnp.repeat guarantees).

    Positions/weights are computed in float32 regardless of x.dtype — adding
    a bf16 offset to spatial indices ≥32 would quantize positions to
    0.25-pixel steps. Memory note: wmat is a (B, H, W, C/share, n)
    intermediate (~n/share × the activation size); fine for this zoo's
    resolutions, revisit for >56² maps with share=1.
    """
    B, H, W, C = x.shape
    n = x.shape[axis]
    g = C // share
    off = offset.reshape(B, H, W, g, share)[..., 0].astype(jnp.float32)
    if axis == 1:
        pos = jnp.arange(n, dtype=jnp.float32).reshape(1, -1, 1, 1) + off
    else:
        pos = jnp.arange(n, dtype=jnp.float32).reshape(1, 1, -1, 1) + off
    hp = jnp.arange(n, dtype=jnp.float32)
    wmat = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - hp)).astype(x.dtype)
    xg = x.reshape(B, H, W, g, share)
    eq = "bhwgj,bjwgs->bhwgs" if axis == 1 else "bhwgj,bhjgs->bhwgs"
    y = jnp.einsum(eq, wmat, xg, precision=nnf._prec())
    return y.reshape(B, H, W, C)


def _hat_sample_1d_banded(x, offset, axis, share=1, band=4, saturate=True):
    """Banded bilinear sample: identical to _hat_sample_1d whenever every
    offset lies in [-band, band], at O(band) elementwise cost instead of an
    O(n) contraction.

    out[..., i, ...] = Σ_d max(0, 1 − |off − d|) · x[..., i+d, ...]
    (substituting j = i + d in the hat sum) — the hat coefficient is nonzero
    only for d ∈ {⌊off⌋, ⌊off⌋+1}, so offsets bounded by ``band`` need only
    the 2·band+1 static shifts d ∈ [−band, band]. Each term is a zero-padded
    static shift times an elementwise coefficient: pure VPU work, no
    (B,H,W,g,n) hat-matrix intermediate and no n× FLOP blowup.

    ``saturate=True`` (the explicit ActiveMLP(offset_band=D) contract):
    offsets are clamped to ±band, so out-of-band offsets saturate at the
    band edge instead of matching the exact path.

    ``saturate=False`` (the offset_band="auto" fast path): no clamp, and the
    tap range is capped at n−1 — any (i, j) pair that contributes to the
    exact hat sum has |j − i| ≤ n−1, and taps with hat(off − d) = 0 add
    nothing, so the unclamped capped sum equals _hat_sample_1d for ANY
    offset value, in-band or not.
    """
    B, H, W, C = x.shape
    n = x.shape[axis]
    g = C // share
    off = offset.reshape(B, H, W, g, share)[..., 0].astype(jnp.float32)
    if saturate:
        off = jnp.clip(off, -band, band)
    else:
        band = min(band, n - 1)
    xg = x.reshape(B, H, W, g, share)
    out = jnp.zeros_like(xg)
    for d in range(-band, band + 1):
        coeff = jnp.maximum(0.0, 1.0 - jnp.abs(off - d)).astype(x.dtype)
        out = out + coeff[..., None] * _shift_zero(
            xg, axis, d
        )
    return out.reshape(B, H, W, C)


def atm_op(p, x, offset, dimension, share=1, band=None, saturate=True):
    """ActiveMLP ATMOp on NHWC: per-channel learned float offset along one
    axis, then 1x1 matmul (active_mlp.py:65-81). ``band`` selects the banded
    sampler (exact for |offset| ≤ band; with ``saturate=False`` exact for
    any offset — see _hat_sample_1d_banded)."""
    axis = 1 if dimension == "h" else 2
    if band is not None:
        y = _hat_sample_1d_banded(x, offset, axis, share=share, band=band,
                                  saturate=saturate)
    else:
        y = _hat_sample_1d(x, offset, axis, share=share)
    out = jnp.matmul(y, p["weight"][:, :, 0, 0].T, precision=nnf._prec())
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"]
    return out
