"""ActiveMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/active_mlp.py — ATMOp
(ln 37-81): deform_conv2d with a 1x1 weight and LEARNED float offsets along one
axis; offsets generated every ``intv`` blocks by an offset_layer and shared
across ``share_dim`` channels via repeat_interleave (ln 152-166, 330-339); PEG
depthwise positional conv before each offset-generating block (ln 202-224,
330-339); three-branch (w, h, channel) softmax fusion (ln 94-127); overlap
stem, per-stage Downsample attached to the LAST block of a stage (ln 292).
Factories ActiveSmall/Base/Large (+Tiny variants) (ln 359-411).

The learned-offset gather is a per-channel 1-D bilinear sample
(ops/deform.atm_op).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..ops.deform import atm_op


def _atm_layer(bp, x, offset, dim, share=1, band=None):
    C = dim
    w = atm_op(bp["atm_w"], x, offset[..., :C], "w", share=share, band=band)
    h = atm_op(bp["atm_h"], x, offset[..., C:], "h", share=share, band=band)
    c = nnf.linear(bp["atm_c"], x)
    B = x.shape[0]
    a = jnp.mean(w + h + c, axis=(1, 2))
    a = nnf.linear(bp["fusion"]["fc2"], nnf.gelu(nnf.linear(bp["fusion"]["fc1"], a)))
    a = nnf.softmax(a.reshape(B, C, 3).transpose(2, 0, 1), axis=0)
    a = a[:, :, None, None, :]
    y = w * a[0] + h * a[1] + c * a[2]
    return nnf.linear(bp["proj"], y)


def ActiveMLP(
    img_size=224,
    patch_size=4,
    in_chans=3,
    num_classes=1000,
    depths=[2, 2, 4, 2],
    embed_dims=[64, 128, 320, 512],
    mlp_ratios=[4, 4, 4, 4],
    share_dims=[1, 1, 1, 1],
    drop_path_rate=0.0,
    intv=2,
    seed=0,
    offset_band=None,
    **kwargs,
):
    """``offset_band=D`` swaps the exact hat-contraction sampler for the
    banded one (ops/deform._hat_sample_1d_banded): identical outputs whenever
    every learned offset lies in [-D, D] (out-of-band offsets saturate at
    ±D), at O(D) elementwise cost instead of an O(H) MXU contraction."""
    n_stages = len(depths)

    import numpy as _np

    dpr_all = _np.linspace(0, drop_path_rate, sum(depths), dtype=_np.float32)

    def apply(params, x, train=False, rng=None):
        import jax as _jax

        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nnf.conv2d(params["patch_embed"], x, stride=4, padding=2)
        offset = None
        for i in range(n_stages):
            dim = embed_dims[i]
            for j in range(depths[i]):
                gidx = sum(depths[:i]) + j
                if rng is not None and train:
                    r1, r2 = _jax.random.split(_jax.random.fold_in(rng, gidx))
                else:
                    r1 = r2 = None
                dprv = float(dpr_all[gidx])
                bp = params["blocks"][i][j]
                if j % intv == 0 and j != depths[i] - 1:
                    # PEG, then generate new offsets (active_mlp.py:330-339)
                    peg = params["pos_blocks"][i]
                    x = nnf.conv2d(peg, x, padding=1, groups=dim) + x
                    o = nnf.layer_norm(bp["offset_layer"]["0"], x)
                    o = nnf.linear(bp["offset_layer"]["1"], o)
                    offset = jnp.repeat(o, share_dims[i], axis=-1)
                y = nnf.layer_norm(bp["norm1"], x)
                y = _atm_layer(bp["atm"], y, offset, dim,
                               share=share_dims[i], band=offset_band)
                x = x + nnf.drop_path(r1, y, dprv, train)
                y = nnf.layer_norm(bp["norm2"], x)
                y = nnf.linear(bp["mlp"]["fc2"], nnf.gelu(nnf.linear(bp["mlp"]["fc1"], y)))
                x = x + nnf.drop_path(r2, y, dprv, train)
                if "downsample" in bp:
                    x = nnf.conv2d(bp["downsample"]["proj"], x, stride=2, padding=1)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nnf.layer_norm(params["norm"], x)
        x = jnp.mean(x, axis=1)
        return nnf.linear(params["head"], x)

    def _structure(nested):
        blocks = []
        for i in range(n_stages):
            st = nested["blocks"][str(i)]
            blocks.append([st[str(j)] for j in range(depths[i])])
        return {
            "patch_embed": nested["patch_embed"]["proj"],
            "blocks": blocks,
            "pos_blocks": [
                nested["pos_blocks"][str(i)]["proj"] for i in range(n_stages)
            ],
            "norm": nested["norm"],
            "head": nested["head"],
        }

    b = SDBuilder(seed)
    b.conv2d("patch_embed.proj", in_chans, embed_dims[0], 7)
    for i in range(n_stages):
        d = embed_dims[i]
        for j in range(depths[i]):
            pre = f"blocks.{i}.{j}"
            b.layer_norm(f"{pre}.norm1", d)
            b.linear(f"{pre}.atm.atm_c", d, d, bias=False)
            b.conv2d(f"{pre}.atm.atm_h", d, d, 1)
            b.conv2d(f"{pre}.atm.atm_w", d, d, 1)
            b.linear(f"{pre}.atm.fusion.fc1", d, d // 4)
            b.linear(f"{pre}.atm.fusion.fc2", d // 4, d * 3)
            b.linear(f"{pre}.atm.proj", d, d)
            b.layer_norm(f"{pre}.norm2", d)
            b.linear(f"{pre}.mlp.fc1", d, int(d * mlp_ratios[i]))
            b.linear(f"{pre}.mlp.fc2", int(d * mlp_ratios[i]), d)
            if j % intv == 0 and j != depths[i] - 1:
                b.layer_norm(f"{pre}.offset_layer.0", d)
                b.linear(f"{pre}.offset_layer.1", d, d * 2 // share_dims[i])
            if i < n_stages - 1 and j == depths[i] - 1:
                b.conv2d(f"{pre}.downsample.proj", d, embed_dims[i + 1], 3)
        b.conv2d(f"pos_blocks.{i}.proj", d, d, 3, groups=d)
    b.layer_norm("norm", embed_dims[-1])
    b.linear("head", embed_dims[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("active_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)


def ActivexTiny(pretrained=False, **kwargs):
    return ActiveMLP(depths=[2, 2, 4, 2], mlp_ratios=[4, 4, 4, 4],
                     embed_dims=[64, 128, 320, 512], share_dims=[2, 4, 4, 8],
                     intv=2, **kwargs)


def ActiveTiny(pretrained=False, **kwargs):
    return ActiveMLP(depths=[2, 3, 10, 3], mlp_ratios=[4, 4, 4, 4],
                     embed_dims=[64, 128, 320, 512], share_dims=[2, 4, 4, 8],
                     intv=2, **kwargs)


def ActiveSmall(pretrained=False, **kwargs):
    return ActiveMLP(depths=[3, 4, 18, 3], mlp_ratios=[8, 8, 4, 4],
                     embed_dims=[64, 128, 320, 512], share_dims=[2, 4, 4, 8],
                     intv=6, **kwargs)


def ActiveBase(pretrained=False, **kwargs):
    return ActiveMLP(depths=[3, 8, 27, 3], mlp_ratios=[8, 8, 4, 4],
                     embed_dims=[64, 128, 320, 512], share_dims=[2, 4, 4, 8],
                     intv=6, **kwargs)


def ActiveLarge(pretrained=False, **kwargs):
    return ActiveMLP(depths=[3, 4, 24, 3], mlp_ratios=[4, 4, 4, 4],
                     embed_dims=[96, 192, 384, 768], share_dims=[2, 4, 4, 8],
                     intv=6, **kwargs)
