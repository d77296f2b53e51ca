"""ConvMixer, TPU-native.

Reference semantics: /root/reference/models_pytorch/conv_mixer.py — patch conv
stem (k=s=patch, padding=patch//2) + GELU + BN (ln 17-21); depth blocks of
[depthwise Conv2d(k, groups=dim, padding='same') + GELU + BN residual, then
pointwise conv + GELU + BN] (ln 22-33); avgpool head (ln 35-39).

Depthwise convs lower to XLA feature_group_count convolutions; BN folds into
elementwise scale/shift at inference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model


def ConvMixer(dim, depth, kernel_size=9, patch_size=7, n_classes=1000, seed=0):
    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        e = params["embedding"]
        x = nnf.conv2d(e["0"], x, stride=patch_size, padding=patch_size // 2)
        x = nnf.batch_norm(e["2"], nnf.gelu(x), train=train)

        def block(bp, h):
            y = nnf.conv2d(
                bp["0"]["fn"]["0"], h, padding="same", groups=dim
            )
            y = nnf.batch_norm(bp["0"]["fn"]["2"], nnf.gelu(y), train=train)
            h = h + y
            y = nnf.conv2d(bp["1"], h)
            y = nnf.batch_norm(bp["3"], nnf.gelu(y), train=train)
            return y

        x = nnf.scan_blocks(block, params["blocks"], x)
        x = jnp.mean(x, axis=(1, 2))
        return nnf.linear(params["head"], x)

    def _structure(nested):
        return {
            "embedding": nested["embedding"],
            "blocks": pytree.stack_numbered(nested["blocks"]),
            "head": nested["classifier"]["2"],
        }

    b = SDBuilder(seed)
    b.conv2d("embedding.0", 3, dim, patch_size)
    b.batch_norm("embedding.2", dim)
    for i in range(depth):
        b.conv2d(f"blocks.{i}.0.fn.0", dim, dim, kernel_size, groups=dim)
        b.batch_norm(f"blocks.{i}.0.fn.2", dim)
        b.conv2d(f"blocks.{i}.1", dim, dim, 1)
        b.batch_norm(f"blocks.{i}.3", dim)
    b.linear("classifier.2", dim, n_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("conv_mixer", apply, params, importer=_structure,
                 init_sd=b.sd)
