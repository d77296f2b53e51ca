"""MorphMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/morph_mlp.py — MorphFC
(ln 23-70): three 1x1 convs (fc_h with symmetric zero-pad/crop on H when H%L>0,
fc_w likewise on W, fc_c plain), summed. (The Rearrange members are defined but
unused in forward — both the torch and jittor references apply the convs
without the chunk reshape; we reproduce that executed behavior.) Blocks are
BN-prenorm residual (ln 73-85); overlap patch stem 7/4/2 + BN, stride-2 conv
downsamples (ln 88-108), BN → GAP → Linear head. Settings T/S/B/L (ln 111-116).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model

morphmlp_settings = {
    "T": [[3, 4, 7, 3], [4, 4, 4, 4], [84, 168, 336, 588], [14, 28, 28, 49], [0.1, 0.1, 0.1, 0.1]],
    "S": [[3, 4, 9, 3], [4, 4, 4, 4], [112, 224, 392, 784], [14, 28, 28, 49], [0.1, 0.1, 0.1, 0.1]],
    "B": [[4, 6, 15, 4], [4, 4, 4, 4], [112, 224, 392, 784], [14, 28, 28, 49], [0.3, 0.3, 0.3, 0.3]],
    "L": [[4, 8, 18, 6], [4, 4, 4, 4], [112, 224, 392, 784], [14, 28, 28, 49], [0.4, 0.4, 0.4, 0.4]],
}


_conv11 = nnf.conv1x1


def _morph_fc(bp, x, L):
    """x NHWC. Padding before a 1x1 conv then cropping is the identity on the
    interior, but we replicate the reference's pad/crop literally for exact
    boundary semantics (morph_mlp.py:49-63)."""
    H, W = x.shape[1], x.shape[2]
    x_h, x_w = x, x
    crop_h = crop_w = None
    if H % L > 0:
        pt = (L - H % L) // 2
        pb = (L - H % L) - pt
        x_h = jnp.pad(x, ((0, 0), (pt, pb), (0, 0), (0, 0)))
        crop_h = (pt, pt + H)
    if W % L > 0:
        pl = (L - W % L) // 2
        pr = (L - W % L) - pl
        x_w = jnp.pad(x, ((0, 0), (0, 0), (pl, pr), (0, 0)))
        crop_w = (pl, pl + W)
    x_h = _conv11(bp["fc_h"], x_h)
    x_w = _conv11(bp["fc_w"], x_w)
    x_c = _conv11(bp["fc_c"], x)
    if crop_h:
        x_h = x_h[:, crop_h[0] : crop_h[1]]
    if crop_w:
        x_w = x_w[:, :, crop_w[0] : crop_w[1]]
    return x_h + x_w + x_c


def MorphMLP(model_name="T", pretrained=None, num_classes=1000, seed=0, **kwargs):
    assert model_name in morphmlp_settings
    layers, mlp_ratios, embed_dims, chunk_len, stoch_drop = morphmlp_settings[model_name]
    n_stages = len(layers)

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        pe = params["patch_embed"]
        x = nnf.conv2d(pe["proj"], x, stride=4, padding=2)
        x = nnf.batch_norm(pe["norm"], x, train=train)
        for si in range(n_stages):
            st = params["stages"][si]

            def block(bp, h, r):
                import jax as _jax

                r1, r2 = (None, None) if r is None else _jax.random.split(r)
                y = nnf.batch_norm(bp["norm1"], h, train=train)
                y = _morph_fc(bp["attn"], y, chunk_len[si])
                h = h + nnf.drop_path(r1, y, stoch_drop[si], train)
                y = nnf.batch_norm(bp["norm2"], h, train=train)
                y = _conv11(bp["mlp"]["fc2"], nnf.gelu(_conv11(bp["mlp"]["fc1"], y)))
                return h + nnf.drop_path(r2, y, stoch_drop[si], train)

            x = nnf.scan_blocks_rng(block, st["blocks"], x, rng if train else None)
            if "down" in st:
                x = nnf.conv2d(st["down"]["proj"], x, stride=2, padding=1)
                x = nnf.batch_norm(st["down"]["norm"], x, train=train)
        x = nnf.batch_norm(params["norm"], x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nnf.linear(params["head"], x)

    def _structure(nested):
        stages = []
        for si in range(n_stages):
            entry = {"blocks": pytree.stack_numbered(nested["network"][str(2 * si)])}
            if si + 1 < n_stages:
                entry["down"] = nested["network"][str(2 * si + 1)]
            stages.append(entry)
        return {
            "patch_embed": nested["patch_embed"],
            "stages": stages,
            "norm": nested["norm"],
            "head": nested["head"],
        }

    b = SDBuilder(seed)
    b.conv2d("patch_embed.proj", 3, embed_dims[0], 7)
    b.batch_norm("patch_embed.norm", embed_dims[0])
    for si in range(n_stages):
        d = embed_dims[si]
        for j in range(layers[si]):
            pre = f"network.{2 * si}.{j}"
            b.batch_norm(f"{pre}.norm1", d)
            b.conv2d(f"{pre}.attn.fc_h", d, d, 1)
            b.conv2d(f"{pre}.attn.fc_w", d, d, 1)
            b.conv2d(f"{pre}.attn.fc_c", d, d, 1)
            b.batch_norm(f"{pre}.norm2", d)
            b.conv2d(f"{pre}.mlp.fc1", d, int(d * mlp_ratios[si]), 1)
            b.conv2d(f"{pre}.mlp.fc2", int(d * mlp_ratios[si]), d, 1)
        if si + 1 < n_stages:
            b.conv2d(f"network.{2 * si + 1}.proj", d, embed_dims[si + 1], 3)
            b.batch_norm(f"network.{2 * si + 1}.norm", embed_dims[si + 1])
    b.batch_norm("norm", embed_dims[-1])
    b.linear("head", embed_dims[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    model = Model("morph_mlp", apply, params, importer=_structure,
                  init_sd=b.sd)
    if pretrained:
        from ..utils.checkpoint import load_torch_checkpoint

        model.load_torch_state_dict(load_torch_checkpoint(pretrained))
    return model
