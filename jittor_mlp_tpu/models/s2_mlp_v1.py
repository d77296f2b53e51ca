"""S2-MLP v1, TPU-native.

Reference semantics: /root/reference/models_pytorch/s2_mlp_v1.py — stages of
conv patchify + S2Blocks (ln 55-93); each block is PreNormResidual(Linear →
GELU → 4-way Spatial_Shift → Linear) + PreNormResidual(FF) (ln 27-47). The
shift (ln 15-25) uses the functional boundary-keep semantics (see
ops/shift.py). Factories S2MLPv1_deep / S2MLPv1_wide (ln 95-113).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..ops.shift import spatial_shift1
from ..utils import pair


def S2MLPv1(
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

            def block(bp, h):
                t, c = bp["0"], bp["1"]
                y = nnf.layer_norm(t["norm"], h)
                y = nnf.gelu(nnf.linear(t["fn"]["0"], y))
                y = spatial_shift1(y)
                y = nnf.linear(t["fn"]["3"], y)
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
        b.conv2d(f"stages.{si}.0", cin, d_model[si], pair(patch_size[si]))
        for j in range(depth[si]):
            pre = f"stages.{si}.1.model.{j}"
            d = d_model[si]
            b.layer_norm(f"{pre}.0.norm", d)
            b.linear(f"{pre}.0.fn.0", d, d)
            b.linear(f"{pre}.0.fn.3", d, d)
            b.layer_norm(f"{pre}.1.norm", d)
            b.linear(f"{pre}.1.fn.0", d, d * expansion_factor[si])
            b.linear(f"{pre}.1.fn.3", d * expansion_factor[si], d)
    b.linear("mlp_head.1", d_model[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("s2_mlp_v1", apply, params, importer=_structure,
                 init_sd=b.sd)


def S2MLPv1_deep(num_classes: int = 1000, **kwargs):
    return S2MLPv1(
        image_size=224,
        patch_size=[16],
        d_model=[384],
        depth=[36],
        num_classes=num_classes,
        expansion_factor=[4],
        **kwargs,
    )


def S2MLPv1_wide(num_classes: int = 1000, **kwargs):
    return S2MLPv1(
        image_size=224,
        patch_size=[16],
        d_model=[768],
        depth=[12],
        num_classes=num_classes,
        expansion_factor=[4],
        **kwargs,
    )
