"""S2-MLP v2, TPU-native.

Reference semantics: /root/reference/models_pytorch/s2_mlp_v2.py — S2Attention
(ln 53-69): Linear expands ×3, the three chunks go through spatial_shift1 /
spatial_shift2 / identity, SplitAttention (ln 31-51) fuses them, Linear
projects back; then a channel FF; both PreNormResidual. Stages as in v1.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..ops.shift import spatial_shift1, spatial_shift2
from .vip import split_attention
from ..utils import pair


def S2MLPv2(
    image_size=224,
    patch_size=[7, 2],
    in_channels=3,
    num_classes=1000,
    d_model=[192, 384],
    depth=[4, 14],
    expansion_factor=[3, 3],
    block_runner=None,
    seed=0,
):
    n_stages = len(patch_size)
    assert len(depth) == len(d_model) == len(expansion_factor) == n_stages

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        for si in range(n_stages):
            sp = params["stages"][si]
            x = nnf.patch_embed(sp["patch"], x, pair(patch_size[si]))
            c_dim = d_model[si]

            def block(bp, h):
                t, c = bp["0"], bp["1"]
                y = nnf.layer_norm(t["norm"], h)
                y = nnf.linear(t["fn"]["mlp1"], y)
                b1 = spatial_shift1(y[..., :c_dim])
                b2 = spatial_shift2(y[..., c_dim : 2 * c_dim])
                b3 = y[..., 2 * c_dim :]
                y = split_attention(t["fn"]["split_attention"], [b1, b2, b3])
                y = nnf.linear(t["fn"]["mlp2"], y)
                h = h + y
                y = nnf.layer_norm(c["norm"], h)
                y = nnf.gelu(nnf.linear(c["fn"]["0"], y))
                y = nnf.linear(c["fn"]["3"], y)
                return h + y

            if block_runner is not None:
                x = block_runner(block, sp["blocks"], x)
            else:
                x = nnf.scan_blocks(block, sp["blocks"], x)
        x = jnp.mean(x, axis=(1, 2))
        return nnf.linear(params["head"], x)

    def _structure(nested):
        stages = []
        for si in range(n_stages):
            st = nested["stages"][str(si)]
            stages.append(
                {"patch": st["0"], "blocks": pytree.stack_numbered(st["1"]["model"])}
            )
        return {"stages": stages, "head": nested["mlp_head"]["1"]}

    b = SDBuilder(seed)
    for si in range(n_stages):
        cin = in_channels if si == 0 else d_model[si - 1]
        d = d_model[si]
        b.conv2d(f"stages.{si}.0", cin, d, pair(patch_size[si]))
        for j in range(depth[si]):
            pre = f"stages.{si}.1.model.{j}"
            b.layer_norm(f"{pre}.0.norm", d)
            b.linear(f"{pre}.0.fn.mlp1", d, d * 3)
            b.linear(f"{pre}.0.fn.mlp2", d, d)
            b.linear(f"{pre}.0.fn.split_attention.mlp1", d, d, bias=False)
            b.linear(f"{pre}.0.fn.split_attention.mlp2", d, d * 3, bias=False)
            b.layer_norm(f"{pre}.1.norm", d)
            b.linear(f"{pre}.1.fn.0", d, d * expansion_factor[si])
            b.linear(f"{pre}.1.fn.3", d * expansion_factor[si], d)
    b.linear("mlp_head.1", d_model[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("s2_mlp_v2", apply, params, importer=_structure,
                 init_sd=b.sd)
