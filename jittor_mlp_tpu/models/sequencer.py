"""Sequencer2D, TPU-native.

Reference semantics: /root/reference/models_pytorch/sequencer.py — BiLSTM2D
(ln 31-46): bidirectional LSTM over columns (batch-flattened) and rows, concat
4·hidden → Linear back to d_model; PreNormResidual pairs with channel FF
(ln 49-72); stage patch sizes [7,2,1,1] (ln 80); settings S/M/L (ln 5-9).
The cuDNN LSTM becomes a lax.scan over all B·W (resp. B·H) sequences at once
(ops/lstm.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..ops.lstm import bilstm

sequencer_settings = {
    "S": [[4, 3, 8, 3], [192, 384, 384, 384], [48, 96, 96, 96], 3],
    "M": [[4, 3, 14, 3], [192, 384, 384, 384], [48, 96, 96, 96], 3],
    "L": [[8, 8, 16, 4], [192, 384, 384, 384], [48, 96, 96, 96], 3],
}


def _bilstm2d(bp, x):
    """x: (B, H, W, C) → vertical + horizontal BiLSTM, concat, fc."""
    B, H, W, C = x.shape
    v = bilstm(bp["rnn_v"], jnp.swapaxes(x, 1, 2).reshape(B * W, H, C))
    v = jnp.swapaxes(v.reshape(B, W, H, -1), 1, 2)
    h = bilstm(bp["rnn_h"], x.reshape(B * H, W, C))
    h = h.reshape(B, H, W, -1)
    return nnf.linear(bp["fc"], jnp.concatenate([v, h], axis=-1))


def Sequencer2D(model_name="M", pretrained=None, num_classes=1000, in_channels=3,
                seed=0, **kwargs):
    assert model_name in sequencer_settings
    depth, embed_dims, hidden_dims, expansion_factor = sequencer_settings[model_name]
    patch_sizes = [7, 2, 1, 1]
    n_stages = len(depth)

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        for si in range(n_stages):
            st = params["stages"][si]
            x = nnf.patch_embed(st["patch"], x, patch_sizes[si])

            def block(bp, h):
                y = nnf.layer_norm(bp["0"]["norm"], h)
                y = _bilstm2d(bp["0"]["fn"]["0"], y)
                h = h + y
                y = nnf.layer_norm(bp["1"]["norm"], h)
                y = nnf.gelu(nnf.linear(bp["1"]["fn"]["0"], y))
                y = nnf.linear(bp["1"]["fn"]["3"], y)
                return h + y

            x = nnf.scan_blocks(block, st["blocks"], x)
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
        cin = in_channels if si == 0 else embed_dims[si - 1]
        d, hd = embed_dims[si], hidden_dims[si]
        b.conv2d(f"stages.{si}.0", cin, d, patch_sizes[si])
        for j in range(depth[si]):
            pre = f"stages.{si}.1.model.{j}"
            b.layer_norm(f"{pre}.0.norm", d)
            b.lstm(f"{pre}.0.fn.0.rnn_v", d, hd)
            b.lstm(f"{pre}.0.fn.0.rnn_h", d, hd)
            b.linear(f"{pre}.0.fn.0.fc", 4 * hd, d)
            b.layer_norm(f"{pre}.1.norm", d)
            b.linear(f"{pre}.1.fn.0", d, d * expansion_factor)
            b.linear(f"{pre}.1.fn.3", d * expansion_factor, d)
    b.linear("mlp_head.1", embed_dims[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    model = Model("sequencer", apply, params, importer=_structure,
                  init_sd=b.sd)
    if pretrained:
        from ..utils.checkpoint import load_torch_checkpoint

        model.load_torch_state_dict(load_torch_checkpoint(pretrained))
    return model
