"""ConvMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/conv_mlp.py — ConvTokenizer
(3 conv-BN-ReLU + maxpool, ln 52-87), ConvStage of residual 1x1/3x3/1x1
conv-BN-ReLU bottlenecks + strided downsample conv (ln 91-126), then MLP stages:
ConvMLPStage = LN→MLP residual, LN→depthwise 3x3 'connect' conv, LN→MLP residual
(ln 146-170) with ConvDownsample between stages (ln 173-182); LN → token mean →
Linear head (ln 240-260). Factories convmlp_s/m/l (ln 288-306).
``pretrained=True`` downloads the torch checkpoint via torch.hub and imports it.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model


def ConvMLP(
    depth,
    d_model,
    expansion_factor,
    channels=64,
    n_conv_blocks=3,
    classifier_head=True,
    num_classes=1000,
    seed=0,
):
    n_stages = len(depth)

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        # tokenizer: conv-BN-ReLU x3 + maxpool (indices 0,1 / 3,4 / 6,7, pool 9)
        tk = params["tokenizer"]["block"]
        for ci, bi, stride in (("0", "1", 2), ("3", "4", 1), ("6", "7", 1)):
            x = nnf.conv2d(tk[ci], x, stride=stride, padding=1)
            x = nnf.relu(nnf.batch_norm(tk[bi], x, train=train))
        x = nnf.max_pool2d(x, 3, 2, 1)

        # conv stage: residual bottlenecks + downsample
        cs = params["conv_stages"]
        for j in range(n_conv_blocks):
            blk = cs["conv_blocks"][str(j)]
            y = nnf.relu(nnf.batch_norm(blk["1"], nnf.conv2d(blk["0"], x), train=train))
            y = nnf.relu(
                nnf.batch_norm(blk["4"], nnf.conv2d(blk["3"], y, padding=1), train=train)
            )
            y = nnf.relu(nnf.batch_norm(blk["7"], nnf.conv2d(blk["6"], y), train=train))
            x = x + y
        x = nnf.conv2d(cs["downsample"], x, stride=2, padding=1)

        # MLP stages
        for si in range(n_stages):
            st = params["stages"][si]

            def block(bp, h, r):
                import jax as _jax

                r1, r2 = (None, None) if r is None else _jax.random.split(r)
                y = nnf.layer_norm(bp["norm1"], h)
                y = nnf.linear(
                    bp["channel_mlp1"]["fc2"],
                    nnf.gelu(nnf.linear(bp["channel_mlp1"]["fc1"], y)),
                )
                h = h + nnf.drop_path(r1, y, bp["_dpr"], train)
                y = nnf.layer_norm(bp["connect_norm"], h)
                h = nnf.conv2d(bp["connect"], y, padding=1, groups=y.shape[-1])
                y = nnf.layer_norm(bp["norm2"], h)
                y = nnf.linear(
                    bp["channel_mlp2"]["fc2"],
                    nnf.gelu(nnf.linear(bp["channel_mlp2"]["fc1"], y)),
                )
                return h + nnf.drop_path(r2, y, bp["_dpr"], train)

            x = nnf.scan_blocks_rng(block, st["blocks"], x, rng if train else None)
            if "downsample" in st:
                x = nnf.conv2d(st["downsample"], x, stride=2, padding=1)

        if "head" not in params:
            return x
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nnf.layer_norm(params["norm"], x)
        x = jnp.mean(x, axis=1)
        return nnf.linear(params["head"], x)

    import numpy as _np

    def _structure(nested):
        stages = []
        for si in range(n_stages):
            st = nested["stages"][str(si)]
            entry = {"blocks": pytree.stack_numbered(st["blocks"])}
            # conv_mlp.py:194: per-stage linspace(0, 0.1, num_blocks)
            entry["blocks"]["_dpr"] = jnp.asarray(
                _np.linspace(0, 0.1, depth[si], dtype=_np.float32)
            )
            if "downsample_mlp" in st and "downsample" in st["downsample_mlp"]:
                entry["downsample"] = st["downsample_mlp"]["downsample"]
            stages.append(entry)
        out = {
            "tokenizer": nested["tokenizer"],
            "conv_stages": nested["conv_stages"],
            "stages": stages,
        }
        if "head" in nested:
            out["norm"] = nested["norm"]
            out["head"] = nested["head"]
        return out

    b = SDBuilder(seed)
    c2 = channels // 2
    b.conv2d("tokenizer.block.0", 3, c2, 3, bias=False)
    b.batch_norm("tokenizer.block.1", c2)
    b.conv2d("tokenizer.block.3", c2, c2, 3, bias=False)
    b.batch_norm("tokenizer.block.4", c2)
    b.conv2d("tokenizer.block.6", c2, channels, 3, bias=False)
    b.batch_norm("tokenizer.block.7", channels)
    hid = d_model[0]
    for j in range(n_conv_blocks):
        pre = f"conv_stages.conv_blocks.{j}"
        b.conv2d(f"{pre}.0", channels, hid, 1, bias=False)
        b.batch_norm(f"{pre}.1", hid)
        b.conv2d(f"{pre}.3", hid, hid, 3, bias=False)
        b.batch_norm(f"{pre}.4", hid)
        b.conv2d(f"{pre}.6", hid, channels, 1, bias=False)
        b.batch_norm(f"{pre}.7", channels)
    b.conv2d("conv_stages.downsample", channels, d_model[0], 3)
    for si in range(n_stages):
        d = d_model[si]
        ff = int(d * expansion_factor[si])
        for j in range(depth[si]):
            pre = f"stages.{si}.blocks.{j}"
            b.layer_norm(f"{pre}.norm1", d)
            b.linear(f"{pre}.channel_mlp1.fc1", d, ff)
            b.linear(f"{pre}.channel_mlp1.fc2", ff, d)
            b.layer_norm(f"{pre}.norm2", d)
            b.conv2d(f"{pre}.connect", d, d, 3, groups=d, bias=False)
            b.layer_norm(f"{pre}.connect_norm", d)
            b.linear(f"{pre}.channel_mlp2.fc1", d, ff)
            b.linear(f"{pre}.channel_mlp2.fc2", ff, d)
        if si + 1 < n_stages:
            b.conv2d(
                f"stages.{si}.downsample_mlp.downsample", d, d_model[si + 1], 3
            )
    if classifier_head:
        b.layer_norm("norm", d_model[-1])
        b.linear("head", d_model[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("conv_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)


def _convmlp(arch, pretrained, progress, classifier_head, depth, d_model,
             expansion_factor, **kwargs):
    model = ConvMLP(
        depth=depth,
        d_model=d_model,
        expansion_factor=expansion_factor,
        classifier_head=classifier_head,
        **kwargs,
    )
    if pretrained:
        from ..utils.checkpoint import load_pretrained

        urls = {
            "convmlp_s": "http://ix.cs.uoregon.edu/~alih/conv-mlp/checkpoints/convmlp_s_imagenet.pth",
            "convmlp_m": "http://ix.cs.uoregon.edu/~alih/conv-mlp/checkpoints/convmlp_m_imagenet.pth",
            "convmlp_l": "http://ix.cs.uoregon.edu/~alih/conv-mlp/checkpoints/convmlp_l_imagenet.pth",
        }
        sd = load_pretrained(f"{arch}_imagenet.pth", urls[arch])
        model.load_torch_state_dict(sd)
    return model


def convmlp_s(pretrained=False, progress=False, classifier_head=True, **kwargs):
    return _convmlp("convmlp_s", pretrained, progress, classifier_head,
                    depth=[2, 4, 2], d_model=[128, 256, 512],
                    expansion_factor=[2, 2, 2], channels=64, n_conv_blocks=2,
                    **kwargs)


def convmlp_m(pretrained=False, progress=False, classifier_head=True, **kwargs):
    return _convmlp("convmlp_m", pretrained, progress, classifier_head,
                    depth=[3, 6, 3], d_model=[128, 256, 512],
                    expansion_factor=[3, 3, 3], channels=64, n_conv_blocks=3,
                    **kwargs)


def convmlp_l(pretrained=False, progress=False, classifier_head=True, **kwargs):
    return _convmlp("convmlp_l", pretrained, progress, classifier_head,
                    depth=[4, 8, 3], d_model=[192, 384, 768],
                    expansion_factor=[3, 3, 3], channels=96, n_conv_blocks=3,
                    **kwargs)
