"""HireMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/hire_mlp.py — each
HireMLPBlock (ln 97-152) pads H/W up to the next region multiple (always
padding a full extra region when already divisible — reproduced exactly) with a
configurable mode incl. 'circular', optionally rolls H/W by cross_region_step
every ``cross_region_interval`` blocks (ln 106-118), rearranges inner regions
into the channel axis ('b c (h group) w -> b (c h) group w', h-outer/c-major
channel order), applies bottleneck 1x1-conv FFNs per direction plus a channel
1x1 (ln 126-128), restores, sums, crops. Stages with stride-2 conv merges
(ln 154-186), LN → mean → Linear head (ln 217-221).

All rearranges are static reshape/transpose; rolls are jnp.roll with a stacked
per-block step (0 == identity) so stages still run under lax.scan.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..utils import pair

_PAD_MODE = {
    "constant": "constant",
    "circular": "wrap",
    "reflect": "reflect",
    "replicate": "edge",
}


def hire_block(bp, x, h, w, step, padding_type):
    """x: (B, H, W, C); step: traced int (0 → no cross-region roll).

    The reference rearranges inner regions into channels, 1x1-convs, and
    rearranges back (hire_mlp.py:53-95). Materializing those transposes costs
    4 full-tensor relayouts per block on a bandwidth-bound model; instead the
    region axis stays where the reshape put it and the bottleneck FFs contract
    it jointly with C via dot_general — identical math ('(c h)' c-major
    channel order = weight reshape (·, C, h)), zero relayouts."""
    B, H, W, C = x.shape
    pad_h = h - H % h
    pad_w = w - W % w
    x = jnp.pad(
        x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode=_PAD_MODE[padding_type]
    )
    Hp, Wp = H + pad_h, W + pad_w
    gh, gw = Hp // h, Wp // w

    # H path: roll, split Hp → (h, gh) in place, contract (C, h) jointly
    xh = jnp.roll(x, step, axis=1).reshape(B, h, gh, Wp, C)
    xh = _ff_fold_h(bp["proj_h"], xh, C, h)
    xh = jnp.roll(xh.reshape(B, Hp, Wp, C), -step, axis=1)

    # W path: split Wp → (w, gw) in place
    xw = jnp.roll(x, step, axis=2).reshape(B, Hp, w, gw, C)
    xw = _ff_fold_w(bp["proj_w"], xw, C, w)
    xw = jnp.roll(xw.reshape(B, Hp, Wp, C), -step, axis=2)

    # channel path
    xc = nnf.conv1x1(bp["proj_c"], x)

    out = xc + xh + xw
    return out[:, :H, :W, :]


def _ff_weights(p, C, r):
    """Bottleneck 1x1-conv pair as region-split tensors: W0 (K, C·r, 1, 1) →
    (K, C, r); W2 (C·r, K, 1, 1) → (C, r, K). '(c h)' is c-major
    (hire_mlp.py:62: 'b c (h group) w -> b (c w) ...' channel order)."""
    w0 = p["net"]["0"]["weight"]
    b0 = p["net"]["0"]["bias"]
    w2 = p["net"]["2"]["weight"]
    b2 = p["net"]["2"]["bias"]
    K = w0.shape[0]
    w0 = w0.reshape(K, C, r)
    w2 = w2.reshape(C, r, K)
    return w0, b0, w2, b2


def _ff_fold_h(p, x5, C, h):
    """x5 (B, h, gh, Wp, C) → FF over the (C, h) region jointly → same shape."""
    f = x5.dtype
    w0, b0, w2, b2 = _ff_weights(p, C, h)
    t = jnp.einsum("bhgwc,kch->bgwk", x5, w0.astype(f),
                   precision=nnf._prec()) + b0.astype(f)
    t = nnf.gelu(t)
    y = jnp.einsum("bgwk,chk->bhgwc", t, w2.astype(f),
                   precision=nnf._prec())
    return y + b2.astype(f).reshape(C, h).T[None, :, None, None, :]


def _ff_fold_w(p, x5, C, w):
    """x5 (B, Hp, w, gw, C) → FF over the (C, w) region jointly → same shape."""
    f = x5.dtype
    w0, b0, w2, b2 = _ff_weights(p, C, w)
    t = jnp.einsum("bhwgc,kcw->bhgk", x5, w0.astype(f),
                   precision=nnf._prec()) + b0.astype(f)
    t = nnf.gelu(t)
    y = jnp.einsum("bhgk,cwk->bhwgc", t, w2.astype(f),
                   precision=nnf._prec())
    return y + b2.astype(f).reshape(C, w).T[None, None, :, None, :]


def HireMLP(
    patch_size=4,
    in_channels=3,
    num_classes=1000,
    d_model=[64, 128, 320, 512],
    h=[4, 3, 3, 2],
    w=[4, 3, 3, 2],
    cross_region_step=[2, 2, 1, 1],
    cross_region_interval=2,
    depth=[4, 6, 24, 3],
    expansion_factor=2,
    patcher_norm=False,
    padding_type="circular",
    seed=0,
):
    patch_size = pair(patch_size)
    n_stages = len(depth)

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nnf.conv2d(params["patcher"], x, stride=patch_size, padding=3)
        if patcher_norm:
            x = nnf.layer_norm(params["patcher_norm"], x)
        for si in range(n_stages):
            st = params["stages"][si]

            def block(bp, hcar):
                y = nnf.layer_norm(bp["0"]["norm"], hcar)
                y = hire_block(
                    bp["0"]["fn"]["0"], y, h[si], w[si], bp["_step"],
                    padding_type,
                )
                hcar = hcar + y
                y = nnf.layer_norm(bp["1"]["norm"], hcar)
                y = nnf.gelu(nnf.linear(bp["1"]["fn"]["0"], y))
                y = nnf.linear(bp["1"]["fn"]["3"], y)
                return hcar + y

            x = nnf.scan_blocks(block, st["blocks"], x)
            if "merge" in st:
                x = nnf.conv2d(st["merge"], x, stride=2, padding=1)
        x = nnf.layer_norm(params["head_norm"], x)
        x = jnp.mean(x, axis=(1, 2))
        return nnf.linear(params["head"], x)

    def _structure(nested):
        stages = []
        for si in range(n_stages):
            st = nested["layers"][str(si)]
            blocks = pytree.stack_numbered(st["model"])
            # cross-region every interval blocks: block j uses roll iff
            # (j+1) % interval == 0 (hire_mlp.py:107, cross_region_id=i_depth+1)
            steps = np.array(
                [
                    cross_region_step[si]
                    if (j + 1) % cross_region_interval == 0
                    else 0
                    for j in range(depth[si])
                ],
                dtype=np.int32,
            )
            blocks["_step"] = jnp.asarray(steps)
            entry = {"blocks": blocks}
            if si + 1 < n_stages:
                entry["merge"] = st["patch_merge"]["1"]["reduction"]["0"]
            stages.append(entry)
        out = {
            "patcher": nested["patcher"]["reduction"]["0"],
            "stages": stages,
            "head_norm": nested["mlp_head"]["0"],
            "head": nested["mlp_head"]["2"],
        }
        if patcher_norm:
            out["patcher_norm"] = nested["patcher"]["reduction"]["1"]["1"]
        return out

    b = SDBuilder(seed)
    b.conv2d("patcher.reduction.0", in_channels, d_model[0], 7)
    if patcher_norm:
        b.layer_norm("patcher.reduction.1.1", d_model[0])
    for si in range(n_stages):
        d = d_model[si]
        for j in range(depth[si]):
            pre = f"layers.{si}.model.{j}"
            b.layer_norm(f"{pre}.0.norm", d)
            b.conv2d(f"{pre}.0.fn.0.proj_h.net.0", h[si] * d, d // 2, 1)
            b.conv2d(f"{pre}.0.fn.0.proj_h.net.2", d // 2, h[si] * d, 1)
            b.conv2d(f"{pre}.0.fn.0.proj_w.net.0", w[si] * d, d // 2, 1)
            b.conv2d(f"{pre}.0.fn.0.proj_w.net.2", d // 2, w[si] * d, 1)
            b.conv2d(f"{pre}.0.fn.0.proj_c", d, d, 1)
            b.layer_norm(f"{pre}.1.norm", d)
            b.linear(f"{pre}.1.fn.0", d, d * expansion_factor)
            b.linear(f"{pre}.1.fn.3", d * expansion_factor, d)
        d_out = d_model[si + 1] if si + 1 < n_stages else d_model[-1]
        b.conv2d(f"layers.{si}.patch_merge.1.reduction.0", d, d_out, 3)
    b.layer_norm("mlp_head.0", d_model[-1])
    b.linear("mlp_head.2", d_model[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("hire_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)
