"""MLP-Mixer, TPU-native.

Reference semantics: /root/reference/models_pytorch/mlp_mixer.py —
patchify Conv2d(k=s=patch) (ln 58-60), then ``depth`` blocks of
PreNormResidual(token FF as Conv1d k=1 over patches) +
PreNormResidual(channel FF as Linear) (ln 30-43), final LayerNorm →
token-mean → Linear head (ln 62-76).

TPU design: patchify is a single reshape+matmul; both FF pairs are token/channel
matmuls on the MXU; all ``depth`` blocks run under one ``lax.scan`` over stacked
params. Layout is (B, N, D) channels-last throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..utils import check_sizes, pair


def _structure(nested):
    return {
        "patcher": nested["patcher"]["0"],
        "blocks": pytree.stack_numbered(nested["model"]),
        "active": nested["active"],
        "head": nested["mlp_head"]["0"],
    }


def _init_state_dict(seed, *, in_channels, d_model, num_classes, patch_size,
                     num_patches, depth, expansion_factor, token_dim):
    b = SDBuilder(seed)
    b.conv2d("patcher.0", in_channels, d_model, patch_size)
    for i in range(depth):
        b.layer_norm(f"model.{i}.0.norm", d_model)
        b.conv1d(f"model.{i}.0.fn.net.0", num_patches, token_dim)
        b.conv1d(f"model.{i}.0.fn.net.3", token_dim, num_patches)
        b.layer_norm(f"model.{i}.1.norm", d_model)
        b.linear(f"model.{i}.1.fn.net.0", d_model, d_model * expansion_factor)
        b.linear(f"model.{i}.1.fn.net.3", d_model * expansion_factor, d_model)
    b.layer_norm("active", d_model)
    b.linear("mlp_head.0", d_model, num_classes)
    return b.sd


def MLPMixerForImageClassification(
    in_channels=3,
    d_model=512,
    num_classes=1000,
    patch_size=16,
    image_size=224,
    depth=12,
    expansion_factor=4,
    token_dim=None,
    use_pallas=True,
    block_runner=None,
    seed=0,
):
    """token_dim: hidden width of the token-mixing FF. Defaults to the
    reference's num_patches*expansion_factor (mlp_mixer.py:37); the paper's
    Mixer-B/16 uses a fixed 384.

    block_runner: optional fn(block_fn, stacked_params, x) replacing the
    default nnf.scan_blocks over the stacked blocks — the hook by which
    parallel.pipeline.pipeline_runner (GPipe stages over 'model') and
    parallel.sequence.token_parallel_mixer_runner (tokens sharded over
    'model') run this model distributed. Overrides the Pallas path."""
    num_patches = check_sizes(image_size, patch_size)
    ph, _ = pair(patch_size)
    if token_dim is None:
        token_dim = num_patches * expansion_factor

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW → NHWC
        x = nnf.patch_embed(params["patcher"], x, ph)
        B = x.shape[0]
        x = x.reshape(B, num_patches, d_model)

        def block(bp, h):
            t, c = bp["0"], bp["1"]
            y = nnf.layer_norm(t["norm"], h)
            y = nnf.conv1d_token(t["fn"]["net"]["0"], y)
            y = nnf.gelu(y)
            y = nnf.conv1d_token(t["fn"]["net"]["3"], y)
            h = h + y
            y = nnf.layer_norm(c["norm"], h)
            y = nnf.linear(c["fn"]["net"]["0"], y)
            y = nnf.gelu(y)
            y = nnf.linear(c["fn"]["net"]["3"], y)
            return h + y

        if block_runner is not None:
            x = block_runner(block, params["blocks"], x)
            x = nnf.layer_norm(params["active"], x)
            x = nnf.global_avg_pool_tokens(x)
            return nnf.linear(params["head"], x)

        from .. import config as _cfg

        if (
            use_pallas
            and x.dtype == jnp.bfloat16
            and B % 2 == 0
            and jax.default_backend() == "tpu"
            and not (_cfg.int8_matmul and train)
        ):
            if _cfg.int8_matmul:
                # W8A8 serving keeps the block fusion AND the 2× int8 MXU
                # rate: weights quantized per forward, activations in VMEM
                from ..ops.pallas.mixer_block_int8 import (
                    fused_mixer_block_int8,
                )

                def qblock(bp, h):
                    t, c = bp["0"], bp["1"]
                    return fused_mixer_block_int8(
                        h,
                        t["norm"]["weight"], t["norm"]["bias"],
                        t["fn"]["net"]["0"]["weight"][:, :, 0],
                        t["fn"]["net"]["0"]["bias"],
                        t["fn"]["net"]["3"]["weight"][:, :, 0],
                        t["fn"]["net"]["3"]["bias"],
                        c["norm"]["weight"], c["norm"]["bias"],
                        c["fn"]["net"]["0"]["weight"],
                        c["fn"]["net"]["0"]["bias"],
                        c["fn"]["net"]["3"]["weight"],
                        c["fn"]["net"]["3"]["bias"],
                        bt=2,
                    )

                x = nnf.scan_blocks(qblock, params["blocks"], x)
                x = nnf.layer_norm(params["active"], x)
                x = nnf.global_avg_pool_tokens(x)
                return nnf.linear(params["head"], x)
            # train mode uses the custom-VJP variant (Pallas forward, XLA
            # backward); the mixer has no dropout so train == eval math
            from ..ops.pallas.mixer_block import (
                fused_mixer_block,
                fused_mixer_block_trainable,
            )

            def fblock(bp, h):
                t, c = bp["0"], bp["1"]
                w = (
                    t["norm"]["weight"], t["norm"]["bias"],
                    t["fn"]["net"]["0"]["weight"][:, :, 0],
                    t["fn"]["net"]["0"]["bias"],
                    t["fn"]["net"]["3"]["weight"][:, :, 0],
                    t["fn"]["net"]["3"]["bias"],
                    c["norm"]["weight"], c["norm"]["bias"],
                    c["fn"]["net"]["0"]["weight"], c["fn"]["net"]["0"]["bias"],
                    c["fn"]["net"]["3"]["weight"], c["fn"]["net"]["3"]["bias"],
                )
                if train:
                    if _cfg.pallas_bwd:
                        from ..ops.pallas.mixer_block_bwd import (
                            fused_mixer_block_train,
                        )

                        return fused_mixer_block_train(2, h, *w)
                    return fused_mixer_block_trainable(2, h, *w)
                return fused_mixer_block(h, *w, bt=2)

            x = nnf.scan_blocks(fblock, params["blocks"], x)
            x = nnf.layer_norm(params["active"], x)
            x = nnf.global_avg_pool_tokens(x)
            return nnf.linear(params["head"], x)

        x = nnf.scan_blocks(block, params["blocks"], x)
        x = nnf.layer_norm(params["active"], x)
        x = nnf.global_avg_pool_tokens(x)
        return nnf.linear(params["head"], x)

    sd = _init_state_dict(
        seed,
        in_channels=in_channels,
        d_model=d_model,
        num_classes=num_classes,
        patch_size=ph,
        num_patches=num_patches,
        depth=depth,
        expansion_factor=expansion_factor,
        token_dim=token_dim,
    )
    params = _structure(pytree.nest(sd))
    return Model("mlp_mixer", apply, params, importer=_structure,
                 init_sd=sd)
