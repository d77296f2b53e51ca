"""AS-MLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/as_mlp.py — AxialShift
(ln 27-95): 1x1 conv → GroupNorm(1) → GELU, zero-padded channel-group shifts
along W and H (the cupy CUDA kernel of utils/shift_cuda.py:44-72 — here a
static pad/slice composition, ops/shift.axial_shift), per-direction 1x1 convs +
GELU, sum, GroupNorm, 1x1 conv. Swin-style hierarchy with conv PatchMerging
(ln 182-225), GroupNorm(1) everywhere (MyNorm, ln 343-344), GAP head.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..ops.shift import axial_shift
from ..utils import pair


def _gn(p, x):
    return nnf.group_norm(p, x, num_groups=1)


_conv11 = nnf.conv1x1


def _axial_shift_block(ap, x, shift_size):
    y = _conv11(ap["conv1"], x)
    y = nnf.gelu(_gn(ap["norm1"], y))
    y_lr = axial_shift(y, shift_size, axis=2)
    y_td = axial_shift(y, shift_size, axis=1)
    y_lr = nnf.gelu(_conv11(ap["conv2_1"], y_lr))
    y_td = nnf.gelu(_conv11(ap["conv2_2"], y_td))
    y = _gn(ap["norm2"], y_lr + y_td)
    return _conv11(ap["conv3"], y)


def AS_MLP(
    img_size=224,
    patch_size=4,
    in_chans=3,
    num_classes=1000,
    embed_dim=96,
    depths=[2, 2, 6, 2],
    shift_size=5,
    mlp_ratio=4.0,
    as_bias=True,
    drop_rate=0.0,
    drop_path_rate=0.1,
    patch_norm=True,
    use_checkpoint=False,
    seed=0,
    **kwargs,
):
    img_size = pair(img_size)
    patch_size = pair(patch_size)
    n_layers = len(depths)
    num_features = int(embed_dim * 2 ** (n_layers - 1))

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nnf.patch_embed(params["patch_embed"]["proj"], x, patch_size)
        if patch_norm:
            x = _gn(params["patch_embed"]["norm"], x)
        x = nnf.probe("patch_embed", x)
        for i in range(n_layers):
            lp = params["layers"][i]

            def block(bp, h, r):
                r1, r2 = (None, None) if r is None else jax.random.split(r)
                y = _gn(bp["norm1"], h)
                y = _axial_shift_block(bp["axial_shift"], y, shift_size)
                h = h + nnf.drop_path(r1, y, bp["_dpr"], train)
                y = _gn(bp["norm2"], h)
                y = _conv11(bp["mlp"]["fc2"], nnf.gelu(_conv11(bp["mlp"]["fc1"], y)))
                return h + nnf.drop_path(r2, y, bp["_dpr"], train)

            x = nnf.scan_blocks_rng(
                block, lp["blocks"], x, rng if train else None,
                remat=use_checkpoint,
            )
            if "downsample" in lp:
                x0 = x[:, 0::2, 0::2]
                x1 = x[:, 1::2, 0::2]
                x2 = x[:, 0::2, 1::2]
                x3 = x[:, 1::2, 1::2]
                x = jnp.concatenate([x0, x1, x2, x3], -1)
                x = _gn(lp["downsample"]["norm"], x)
                x = _conv11(lp["downsample"]["reduction"], x)
            x = nnf.probe(f"stage{i}", x)
        x = _gn(params["norm"], x)
        x = jnp.mean(x, axis=(1, 2))
        return nnf.linear(params["head"], x)

    # stochastic-depth decay rule (as_mlp.py:393-394)
    total = sum(depths)
    dpr = np.linspace(0, drop_path_rate, total, dtype=np.float32)

    def _structure(nested):
        layers = []
        off = 0
        for i in range(n_layers):
            st = nested["layers"][str(i)]
            entry = {"blocks": pytree.stack_numbered(st["blocks"])}
            entry["blocks"]["_dpr"] = jnp.asarray(dpr[off : off + depths[i]])
            off += depths[i]
            if "downsample" in st:
                entry["downsample"] = st["downsample"]
            layers.append(entry)
        return {
            "patch_embed": nested["patch_embed"],
            "layers": layers,
            "norm": nested["norm"],
            "head": nested["head"],
        }

    b = SDBuilder(seed)
    b.conv2d("patch_embed.proj", in_chans, embed_dim, patch_size)
    if patch_norm:
        b.group_norm("patch_embed.norm", embed_dim)
    for i in range(n_layers):
        dim = int(embed_dim * 2 ** i)
        for j in range(depths[i]):
            pre = f"layers.{i}.blocks.{j}"
            b.group_norm(f"{pre}.norm1", dim)
            for cv in ("conv1", "conv2_1", "conv2_2", "conv3"):
                b.conv2d(f"{pre}.axial_shift.{cv}", dim, dim, 1, bias=as_bias)
            b.group_norm(f"{pre}.axial_shift.norm1", dim)
            b.group_norm(f"{pre}.axial_shift.norm2", dim)
            b.group_norm(f"{pre}.norm2", dim)
            b.conv2d(f"{pre}.mlp.fc1", dim, int(dim * mlp_ratio), 1)
            b.conv2d(f"{pre}.mlp.fc2", int(dim * mlp_ratio), dim, 1)
        if i < n_layers - 1:
            b.group_norm(f"layers.{i}.downsample.norm", 4 * dim)
            b.conv2d(f"layers.{i}.downsample.reduction", 4 * dim, 2 * dim, 1, bias=False)
    b.group_norm("norm", num_features)
    b.linear("head", num_features, num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("as_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)
