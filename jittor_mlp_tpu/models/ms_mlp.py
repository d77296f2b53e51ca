"""MS-MLP (Mix-Shift MLP), TPU-native.

Reference semantics: /root/reference/models_pytorch/ms_mlp.py — MixShiftBlock
(ln 11-78): chunk channels into ``shift_size`` groups (torch.chunk sizing),
roll each by shift_dist along W (lr) and H (td), per-chunk depthwise convs of
mixed kernel sizes, sum both paths, then ConvNeXt-style LN(eps 1e-6) → pwconv1
→ GELU → pwconv2 → LayerScale gamma residual. Downsampling reuses PatchEmbed
with patch 2 (ln 173: the PatchMerging class is defined but unused). Head:
GAP → flatten → LN → Linear (ln 352-367).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..utils import pair


def _chunk_sizes(dim, n):
    """torch.chunk sizing: ceil-sized chunks, last possibly smaller."""
    size = math.ceil(dim / n)
    out = []
    c = 0
    while c < dim:
        out.append(min(size, dim - c))
        c += size
    return out


def MS_MLP(
    img_size=224,
    patch_size=4,
    in_chans=3,
    num_classes=1000,
    embed_dim=96,
    depths=[2, 2, 6, 2],
    shift_size=5,
    shift_dist=[-2, -1, 0, 1, 2],
    mix_size=[[1, 1, 3, 5, 7], [1, 1, 3, 5, 5], [1, 1, 3, 3, 3], [1, 1, 1, 1, 3]],
    mlp_ratio=4.0,
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
            x = nnf.layer_norm(params["patch_embed"]["norm"], x, eps=1e-6)
        for i in range(n_layers):
            dim = int(embed_dim * 2 ** i)
            chunks = _chunk_sizes(dim, shift_size)
            lp = params["layers"][i]

            def block(bp, h, r):
                parts_lr, parts_td = [], []
                c0 = 0
                for k, cs in enumerate(chunks):
                    xc = h[..., c0 : c0 + cs]
                    c0 += cs
                    ks = mix_size[i][k]
                    lr = jnp.roll(xc, shift_dist[k], axis=2)
                    td = jnp.roll(xc, shift_dist[k], axis=1)
                    parts_lr.append(
                        nnf.conv2d(bp["dwconv_lr"][str(k)], lr, padding=ks // 2, groups=cs)
                    )
                    parts_td.append(
                        nnf.conv2d(bp["dwconv_td"][str(k)], td, padding=ks // 2, groups=cs)
                    )
                y = jnp.concatenate(parts_lr, -1) + jnp.concatenate(parts_td, -1)
                y = nnf.layer_norm(bp["norm"], y, eps=1e-6)
                y = nnf.gelu(nnf.linear(bp["pwconv1"], y))
                y = nnf.linear(bp["pwconv2"], y)
                y = bp["gamma"] * y
                return h + nnf.drop_path(r, y, bp["_dpr"], train)

            x = nnf.scan_blocks_rng(
                block, lp["blocks"], x, rng if train else None,
                remat=use_checkpoint,
            )
            if "downsample" in lp:
                ds = lp["downsample"]
                x = nnf.patch_embed(ds["proj"], x, 2)
                x = nnf.layer_norm(ds["norm"], x, eps=1e-6)
        x = jnp.mean(x, axis=(1, 2))
        x = nnf.layer_norm(params["norm"], x, eps=1e-6)
        return nnf.linear(params["head"], x)

    import numpy as _np

    total = sum(depths)
    dpr = _np.linspace(0, drop_path_rate, total, dtype=_np.float32)

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
        b.layer_norm("patch_embed.norm", embed_dim)
    for i in range(n_layers):
        dim = int(embed_dim * 2 ** i)
        chunks = _chunk_sizes(dim, shift_size)
        for j in range(depths[i]):
            pre = f"layers.{i}.blocks.{j}"
            for k, cs in enumerate(chunks):
                ks = mix_size[i][k]
                b.conv2d(f"{pre}.dwconv_lr.{k}", cs, cs, ks, groups=cs)
                b.conv2d(f"{pre}.dwconv_td.{k}", cs, cs, ks, groups=cs)
            b.layer_norm(f"{pre}.norm", dim)
            b.linear(f"{pre}.pwconv1", dim, int(mlp_ratio * dim))
            b.linear(f"{pre}.pwconv2", int(mlp_ratio * dim), dim)
            b.const(f"{pre}.gamma", (dim,), 1e-6)
        if i < n_layers - 1:
            b.conv2d(f"layers.{i}.downsample.proj", dim, 2 * dim, 2)
            b.layer_norm(f"layers.{i}.downsample.norm", 2 * dim)
    b.layer_norm("norm", num_features)
    b.linear("head", num_features, num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("ms_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)
