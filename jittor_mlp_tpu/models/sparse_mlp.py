"""SparseMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/sparse_mlp.py — stages of
[BN-prenorm depthwise 3x3 conv residual; BN-prenorm sMLPBlock residual
(H-linear + W-linear + identity, channel-concat, 1x1 fuse, ln 61-74);
LN-prenorm channel FF residual] (ln 87-107), Swin-style PatchMerging between
stages (ln 17-50), LN → mean → Linear head (ln 153-158).

Everything stays NHWC; the H/W projections are axis matmuls on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..utils import pair


def patch_merging(p, x):
    """Swin PatchMerging (sparse_mlp.py:32-50): 2x2 interleave → LN → Linear."""
    x0 = x[:, 0::2, 0::2, :]
    x1 = x[:, 1::2, 0::2, :]
    x2 = x[:, 0::2, 1::2, :]
    x3 = x[:, 1::2, 1::2, :]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = nnf.layer_norm(p["norm"], x)
    return nnf.linear(p["reduction"], x)


def SparseMLP(
    image_size=224,
    patch_size=4,
    in_channels=3,
    num_classes=1000,
    d_model=96,
    depth=[2, 10, 24, 2],
    expansion_factor=2,
    patcher_norm=False,
    seed=0,
):
    image_size = pair(image_size)
    patch_size = pair(patch_size)
    n_stages = len(depth)
    dims = [d_model * 2 ** i for i in range(n_stages)]

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nnf.patch_embed(params["patcher"], x, patch_size)
        if patcher_norm:
            x = nnf.layer_norm(params["patcher_norm"], x)
        for si in range(n_stages):
            st = params["stages"][si]
            d = dims[si]

            def block(bp, h):
                # depthwise conv, BN prenorm (NHWC channel-last BN)
                y = nnf.batch_norm(bp["0"]["norm"], h, train=train)
                y = nnf.conv2d(bp["0"]["fn"]["0"], y, padding=1, groups=d)
                h = h + y
                # sMLP block
                y = nnf.batch_norm(bp["1"]["norm"], h, train=train)
                sm = bp["1"]["fn"]["0"]
                # NOTE: in-place einsum contraction ("oh,bhwc->bowc") was
                # measured SLOWER here (3,878 → 3,234 img/s b64) — unlike
                # Swin/Hire, the H/W contractions need the channel axis minor
                # anyway, so the moveaxis pair lowers to one clean matmul
                x_h = jnp.moveaxis(
                    nnf.linear(sm["proj_h"], jnp.moveaxis(y, 1, -1)), -1, 1
                )
                x_w = jnp.moveaxis(
                    nnf.linear(sm["proj_w"], jnp.moveaxis(y, 2, -1)), -1, 2
                )
                # fuse 1x1 conv over cat([x_h, x_w, y]): the weight splits
                # by source (W = [W_h | W_w | W_id]), so for d >= 192 we sum
                # three d->d matmuls instead of materializing the 3d-channel
                # concat in HBM (tools/sparse_probe.py, b64 bf16 one v5e:
                # 2.38x/1.37x/2.70x at stages 2-4; 0.86x at d=96 where the
                # concat is cheap, so stage 1 keeps it)
                if d >= 192:
                    # .astype matches nnf.conv2d's 1x1-path dtype behavior
                    # so the two branches agree if param dtype ever
                    # diverges from activation dtype. NB under
                    # config.int8_mode() this branch quantizes the three
                    # sources with per-source activation scales instead of
                    # one shared scale over the 3d concat (documented in
                    # docs/PERFORMANCE.md).
                    wf = sm["fuse"]["weight"][:, :, 0, 0].astype(y.dtype)
                    y = (
                        nnf._dense(x_h, wf[:, :d].T)
                        + nnf._dense(x_w, wf[:, d:2 * d].T)
                        + nnf._dense(y, wf[:, 2 * d:].T)
                        + sm["fuse"]["bias"]
                    )
                else:
                    fused = jnp.concatenate([x_h, x_w, y], axis=-1)
                    y = nnf.conv2d(sm["fuse"], fused)
                h = h + y
                # channel FF, LN prenorm
                y = nnf.layer_norm(bp["3"]["norm"], h)
                y = nnf.gelu(nnf.linear(bp["3"]["fn"]["0"], y))
                y = nnf.linear(bp["3"]["fn"]["3"], y)
                return h + y

            x = nnf.scan_blocks(block, st["blocks"], x)
            if "merge" in st:
                x = patch_merging(st["merge"], x)
        x = nnf.layer_norm(params["head_norm"], x)
        x = jnp.mean(x, axis=(1, 2))
        return nnf.linear(params["head"], x)

    def _structure(nested):
        stages = []
        for si in range(n_stages):
            st = nested["layers"][str(si)]
            entry = {"blocks": pytree.stack_numbered(st["model"])}
            if si + 1 < n_stages:
                entry["merge"] = st["patch_merge"]["1"]
            stages.append(entry)
        out = {
            "patcher": nested["patcher"]["0"],
            "stages": stages,
            "head_norm": nested["mlp_head"]["1"],
            "head": nested["mlp_head"]["3"],
        }
        if patcher_norm:
            out["patcher_norm"] = nested["patcher"]["1"]["1"]
        return out

    b = SDBuilder(seed)
    b.conv2d("patcher.0", in_channels, d_model, patch_size)
    if patcher_norm:
        b.layer_norm("patcher.1.1", d_model)
    for si in range(n_stages):
        d = dims[si]
        for j in range(depth[si]):
            pre = f"layers.{si}.model.{j}"
            b.batch_norm(f"{pre}.0.norm", d)
            b.conv2d(f"{pre}.0.fn.0", d, d, 3, groups=d)
            b.batch_norm(f"{pre}.1.norm", d)
            h_res = image_size[0] // patch_size[0] // (2 ** si)
            w_res = image_size[1] // patch_size[1] // (2 ** si)
            b.linear(f"{pre}.1.fn.0.proj_h", h_res, h_res)
            b.linear(f"{pre}.1.fn.0.proj_w", w_res, w_res)
            b.conv2d(f"{pre}.1.fn.0.fuse", 3 * d, d, 1)
            b.layer_norm(f"{pre}.3.norm", d)
            b.linear(f"{pre}.3.fn.0", d, d * expansion_factor)
            b.linear(f"{pre}.3.fn.3", d * expansion_factor, d)
        # patch_merge params exist for every stage in the reference module tree
        b.layer_norm(f"layers.{si}.patch_merge.1.norm", 4 * d)
        b.linear(f"layers.{si}.patch_merge.1.reduction", 4 * d, 2 * d, bias=False)
    b.layer_norm("mlp_head.1", dims[-1])
    b.linear("mlp_head.3", dims[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("sparse_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)
