"""gMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/g_mlp.py — blocks of
LN → Linear(d→2·ffn) → GELU → SpatialGatingUnit → Linear(ffn→d) + residual
(ln 24-39). The SGU (ln 10-22) chunks channels in half, LayerNorms v, applies a
Conv1d(seq,seq,1) spatial projection (bias init 1.0, ln 15) and gates u·v.

TPU design: the spatial projection is a token-axis matmul on the MXU; all
``depth`` blocks run under one lax.scan over stacked params.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config as _cfg
from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..utils import check_sizes, pair


def _structure(nested):
    return {
        "patcher": nested["patcher"]["0"],
        "blocks": pytree.stack_numbered(nested["model"]),
        "head": nested["mlp_head"]["0"],
    }


def gMLPForImageClassification(
    image_size=256,
    patch_size=16,
    in_channels=3,
    num_classes=1000,
    d_model=256,
    d_ffn=1536,
    depth=30,
    use_pallas=True,
    block_runner=None,
    seed=0,
):
    """block_runner: optional fn(block_fn, stacked_params, x) replacing
    nnf.scan_blocks — the hook for parallel.pipeline (GPipe stages) and
    parallel.sequence runners. Overrides the Pallas path."""
    num_patches = check_sizes(image_size, patch_size)
    ph, _ = pair(patch_size)

    def apply(params, x, train=False, rng=None):
        import jax

        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nnf.patch_embed(params["patcher"], x, ph)
        B = x.shape[0]
        x = x.reshape(B, num_patches, d_model)

        if (
            block_runner is None
            and use_pallas
            and x.dtype == jnp.bfloat16
            and B % 2 == 0
            and jax.default_backend() == "tpu"
            # int8_mode under training falls back to the nnf path (whose
            # make_train_step guard rejects it); int8 serving keeps the
            # fusion via the W8A8 kernel below
            and not (_cfg.int8_matmul and train)
        ):
            # train mode uses the custom-VJP variant (Pallas forward, XLA
            # backward); the block has no dropout so train == eval math
            from ..ops.pallas.gmlp_block import (
                fused_gmlp_block,
                fused_gmlp_block_trainable,
            )

            if _cfg.int8_matmul:
                from ..ops.pallas.gmlp_block_int8 import fused_gmlp_block_int8

            def fblock(bp, h):
                w = (
                    bp["norm"]["weight"], bp["norm"]["bias"],
                    bp["channel_proj1"]["weight"], bp["channel_proj1"]["bias"],
                    bp["sgu"]["norm"]["weight"], bp["sgu"]["norm"]["bias"],
                    bp["sgu"]["spatial_proj"]["weight"][:, :, 0],
                    bp["sgu"]["spatial_proj"]["bias"],
                    bp["channel_proj2"]["weight"], bp["channel_proj2"]["bias"],
                )
                if _cfg.int8_matmul:
                    # W8A8 serving keeps the block fusion AND the 2× int8
                    # MXU rate (see ops/pallas/gmlp_block_int8.py)
                    return fused_gmlp_block_int8(h, *w, bt=2)
                if train:
                    return fused_gmlp_block_trainable(2, h, *w)
                return fused_gmlp_block(h, *w, bt=2)

            x = nnf.scan_blocks(fblock, params["blocks"], x)
            x = nnf.global_avg_pool_tokens(x)
            return nnf.linear(params["head"], x)

        def block(bp, h):
            y = nnf.layer_norm(bp["norm"], h)
            y = nnf.gelu(nnf.linear(bp["channel_proj1"], y))
            u, v = y[..., :d_ffn], y[..., d_ffn:]
            v = nnf.layer_norm(bp["sgu"]["norm"], v)
            v = nnf.conv1d_token(bp["sgu"]["spatial_proj"], v)
            y = nnf.linear(bp["channel_proj2"], u * v)
            return h + y

        if block_runner is not None:
            x = block_runner(block, params["blocks"], x)
        else:
            x = nnf.scan_blocks(block, params["blocks"], x)
        x = nnf.global_avg_pool_tokens(x)
        return nnf.linear(params["head"], x)

    b = SDBuilder(seed)
    b.conv2d("patcher.0", in_channels, d_model, ph)
    for i in range(depth):
        b.layer_norm(f"model.{i}.norm", d_model)
        b.linear(f"model.{i}.channel_proj1", d_model, d_ffn * 2)
        b.linear(f"model.{i}.channel_proj2", d_ffn, d_model)
        b.layer_norm(f"model.{i}.sgu.norm", d_ffn)
        b.conv1d(f"model.{i}.sgu.spatial_proj", num_patches, num_patches)
        b.const(f"model.{i}.sgu.spatial_proj.bias", (num_patches,), 1.0)
    b.linear("mlp_head.0", d_model, num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("g_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)
