"""DynaMixer, TPU-native.

Reference semantics: /root/reference/models_pytorch/dyna_mlp.py — DynaMixerOp
(ln 34-94): per-segment Wd linear projections generate content-dependent
attention softmax(Linear(hidden·len) → len×len) applied by matmul to the
segment-reshaped tokens, separately along W and H; DynaBlock sums h/w/channel
branches then projects (ln 96-111); PreNorm residual pairs with channel FF
(ln 113-132); two conv-patchify stages; mean-pool head. Settings T/M/L
(ln 135-139).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model

dynamlp_settings = {
    "T": [[7, 2], [192, 384], [4, 14], [8, 16], 3, 0.1, 2],
    "M": [[7, 2], [256, 512], [7, 17], [8, 16], 3, 0.1, 2],
    "L": [[7, 2], [256, 512], [9, 27], [8, 16], 3, 0.3, 8],
}

# bf16 batch at which the VPU unroll of the attention application beats the
# 16k-tiny-tile einsum (measured crossovers — see _dyna_op; tools/dyna_probe.py
# overrides these for A/B runs). Training crosses later: the custom-VJP
# backward adds W-term stacks for dattn/dxs that only amortize at b128
# (measured mixed-precision train img/s, remat, one v5e:
# b32 114 vs einsum 391; b64 304 vs 363; b128 520 vs 350).
UNROLL_MIN_BATCH = 64
UNROLL_MIN_BATCH_TRAIN = 128


@jax.custom_vjp
def _attn_apply_unrolled(attn, xs):
    """y[...,v,d] = Σ_w attn[...,v,w]·xs[...,w,d] as W broadcast-FMA terms.

    attn: (B,H,s,V,W); xs: (B,H,s,W,d) → (B,H,s,V,d). The VPU form of the
    16k-tiny-tile contraction (see _dyna_op docstring). The custom VJP keeps
    the backward on the VPU too: dxs is the SAME unroll with attn
    transposed (v↔w roles swap), dattn is W elementwise-mul d-reductions —
    XLA's autodiff of the python loop instead stacked W full-size
    slice-gradients in HBM."""
    W = xs.shape[3]
    acc = attn[..., 0:1] * xs[:, :, :, 0:1]
    for w in range(1, W):
        acc = acc + attn[..., w:w + 1] * xs[:, :, :, w:w + 1]
    return acc


def _attn_apply_fwd(attn, xs):
    return _attn_apply_unrolled(attn, xs), (attn, xs)


def _attn_apply_bwd(res, dy):
    attn, xs = res
    W = xs.shape[3]
    dxs_terms = []
    dattn_terms = []
    for w in range(W):
        # dxs[...,w,:] = Σ_v attn[...,v,w]·dy[...,v,:]
        dxs_terms.append(jnp.sum(attn[..., w:w + 1] * dy, axis=3))
        # dattn[...,v,w] = Σ_d dy[...,v,d]·xs[...,w,d]
        dattn_terms.append(jnp.sum(dy * xs[:, :, :, w:w + 1], axis=-1))
    dxs = jnp.stack(dxs_terms, axis=3).astype(xs.dtype)
    dattn = jnp.stack(dattn_terms, axis=-1).astype(attn.dtype)
    return dattn, dxs


_attn_apply_unrolled.defvjp(_attn_apply_fwd, _attn_apply_bwd)


def _dyna_op(op, x, seg, hidden, axis, train=False):
    """axis=2 → mix along W (DynaMixerOp_w); axis=1 → along H (_h).

    x: (B, H, W, C). 'Wd' is the stacked per-segment projection
    (seg, hidden, C); attend is Linear(hidden*len → len²).

    The attention application Σ_w attn[b,h,s,v,w]·x[b,h,w,s,d] is the
    model's dominant cost as a batched matmul: ~16k (W,W)@(W,d) MXU tiles
    per layer at 0.13 TF/s, 71% of the forward (tools/dyna_probe.py).
    On bf16 at batch ≥ 64 the W-length contraction is unrolled into W
    broadcast-FMA terms on the VPU instead — DynaMixer-T 1,336 → 1,902
    img/s at b64, 3,514 at b128. The win inverts below b64 (530 at b16:
    XLA's small-batch layouts make the unrolled slices relayout-bound),
    so small batches keep the einsum, as do f32 runs — it is the parity
    path, differing only by sum reassociation (≤2e-6). Training uses the
    unroll from batch 128 via the custom VJP above (mixed-precision train,
    remat, one v5e: b128 520 vs einsum 350 img/s; below that the backward's
    W-term stacks dominate — b32 114 vs 391, b64 304 vs 363 — so the tuned
    b32 train point keeps the einsum). A batch-on-lanes Pallas kernel and
    five other formulations measured slower (docs/PERFORMANCE.md,
    tools/dyna_probe.py).
    """
    B, H, W, C = x.shape
    d = C // seg
    if axis == 1:  # operate on H: swap H and W, reuse the W path
        x = jnp.swapaxes(x, 1, 2)
        H, W = W, H
    # per-segment projections emitted directly in (b,h,s,w,o) order so the
    # (s, w*o) attend-input reshape is layout-free
    p = jnp.einsum("bhwc,soc->bhswo", x, op["wd_w"],
                   precision=nnf._prec()) + op["wd_b"][:, None, :]
    attn = p.reshape(B, H, seg, W * hidden)
    attn = nnf.linear(op["attend"], attn).reshape(B, H, seg, W, W)
    attn = nnf.softmax(attn, axis=-1)
    x5 = x.reshape(B, H, W, seg, d)
    min_b = UNROLL_MIN_BATCH_TRAIN if train else UNROLL_MIN_BATCH
    if x.dtype == jnp.bfloat16 and B >= min_b:
        # r4: in training the unroll runs through the custom VJP below (dx =
        # transposed unroll, dattn = W d-reductions, both VPU) — measured
        # faster than the einsum only from b128 (520 vs 350 img/s; at b32/b64
        # the W-term stacks in the backward dominate and the einsum keeps
        # 391/363), hence the higher train threshold
        xs = x5.transpose(0, 1, 3, 2, 4)  # B,H,s,w,d
        acc = _attn_apply_unrolled(attn, xs)
        y = acc.transpose(0, 1, 3, 2, 4).reshape(B, H, W, C)
    else:
        y = jnp.einsum("bhsvw,bhwsd->bhvsd", attn, x5,
                       precision=nnf._prec()).reshape(B, H, W, C)
    y = nnf.linear(op["proc"], y)
    if axis == 1:
        y = jnp.swapaxes(y, 1, 2)
    return y


def DynaMixer(model_name="M", image_size=224, in_channels=3, num_classes=1000, seed=0):
    assert model_name in dynamlp_settings
    patch_size, embed_dims, depths, segment, mlp_ratio, dropout, hidden = (
        dynamlp_settings[model_name]
    )
    n_stages = len(patch_size)
    res = []
    cur = image_size
    for ps in patch_size:
        cur = cur // ps
        res.append(cur)

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        for si in range(n_stages):
            st = params["stages"][si]
            x = nnf.patch_embed(st["patch"], x, patch_size[si])
            seg = segment[si]

            def block(bp, h, r):
                import jax as _jax

                r1, r2 = (None, None) if r is None else _jax.random.split(r)
                y = nnf.layer_norm(bp["0"]["norm"], h)
                fn = bp["0"]["fn"]
                y_c = nnf.linear(fn["proj_c"], y)
                y_h = _dyna_op(fn["op_h"], y, seg, hidden, axis=1, train=train)
                y_w = _dyna_op(fn["op_w"], y, seg, hidden, axis=2, train=train)
                y = nnf.linear(fn["proj_o"], y_h + y_w + y_c)
                # DynaMLPBlock wraps both residuals in DropPath(dropout)
                # (dyna_mlp.py:117,128-130)
                h = h + nnf.drop_path(r1, y, dropout, train)
                y = nnf.layer_norm(bp["1"]["norm"], h)
                y = nnf.gelu(nnf.linear(bp["1"]["fn"]["net"]["0"], y))
                y = nnf.linear(bp["1"]["fn"]["net"]["3"], y)
                return h + nnf.drop_path(r2, y, dropout, train)

            x = nnf.scan_blocks_rng(block, st["blocks"], x, rng if train else None)
        x = jnp.mean(x, axis=(1, 2))
        return nnf.linear(params["head"], x)

    def _restack_op(op, seg):
        """ModuleList Wd.{i} → stacked (seg, hidden, C) + (seg, hidden) bias;
        the '(s d)' concat order in the reference (dyna_mlp.py:54-57) is
        s-major, matching the stack."""
        wds = [op["Wd"][str(i)] for i in range(seg)]
        return {
            "wd_w": jnp.stack([w["weight"] for w in wds]),
            "wd_b": jnp.stack([w["bias"] for w in wds]),
            "attend": op["attend"]["1"],
            "proc": op["proc"],
        }

    def _structure(nested):
        stages = []
        for si in range(n_stages):
            st = nested["stages"][str(si)]
            blocks = []
            layer = st["1"]["layers"]
            for j in sorted(layer, key=int):
                bp = layer[j]
                fn = bp["0"]["fn"]
                blocks.append(
                    {
                        "0": {
                            "norm": bp["0"]["norm"],
                            "fn": {
                                "proj_c": fn["proj_c"],
                                "proj_o": fn["proj_o"],
                                "op_h": _restack_op(fn["DynaMixerOp_h"], segment[si]),
                                "op_w": _restack_op(fn["DynaMixerOp_w"], segment[si]),
                            },
                        },
                        "1": bp["1"],
                    }
                )
            stages.append(
                {"patch": st["0"], "blocks": pytree.stack_layers(blocks)}
            )
        return {"stages": stages, "head": nested["mlp_head"]["1"]}

    b = SDBuilder(seed)
    for si in range(n_stages):
        cin = in_channels if si == 0 else embed_dims[si - 1]
        d = embed_dims[si]
        b.conv2d(f"stages.{si}.0", cin, d, patch_size[si])
        for j in range(depths[si]):
            pre = f"stages.{si}.1.layers.{j}"
            b.layer_norm(f"{pre}.0.norm", d)
            b.linear(f"{pre}.0.fn.proj_c", d, d)
            b.linear(f"{pre}.0.fn.proj_o", d, d)
            for oph, ln in (("DynaMixerOp_h", res[si]), ("DynaMixerOp_w", res[si])):
                for s in range(segment[si]):
                    b.linear(f"{pre}.0.fn.{oph}.Wd.{s}", d, hidden)
                b.linear(f"{pre}.0.fn.{oph}.attend.1", hidden * ln, ln * ln)
                b.linear(f"{pre}.0.fn.{oph}.proc", d, d)
            b.layer_norm(f"{pre}.1.norm", d)
            b.linear(f"{pre}.1.fn.net.0", d, d * mlp_ratio)
            b.linear(f"{pre}.1.fn.net.3", d * mlp_ratio, d)
    b.linear("mlp_head.1", embed_dims[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("dyna_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)
