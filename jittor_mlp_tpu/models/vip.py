"""ViP (Vision Permutator), TPU-native.

Reference semantics: /root/reference/models_pytorch/vip.py — per block, three
parallel branches (segment-permuted H-mixing, W-mixing, channel Linear,
ln 59-79/95-115), fused either by plain sum (``weighted=False``) or by
SplitAttention (ln 37-57), followed by a Linear projection, all inside
PreNormResidual; then a standard channel FF. Head: LN → mean over H,W → Linear
(ln 160-171).

The einops Rearranges 'b h w (c s) -> b w c (h s)' become static
reshape/transpose pairs around a single MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..utils import pair


def _mix_h(p, x, s):
    """Segment-permuted H mixing (vip.py:68-77, 'b h w (c s) -> b w c (h s)'
    → Linear(H·s) → back). The permutes are folded into the contraction: the
    weight reshapes to (k, l, h, s) ('(h s)' is h-major) and one einsum
    contracts (h, s) jointly — the output's (c, l) axes land adjacent, so no
    transpose ever materializes (same relayout-folding trick as HireMLP and
    SwinMLP; contraction width H·s rides the MXU)."""
    B, H, W, C = x.shape
    cs = C // s
    x5 = x.reshape(B, H, W, cs, s)
    w4 = p["weight"].reshape(H, s, H, s)  # (out k, out l, in h, in s)
    y = jnp.einsum("bhwcs,klhs->bkwcl", x5, w4, precision=nnf._prec())
    y = y + p["bias"].reshape(H, s)[:, None, None, :]
    return y.reshape(B, H, W, C)


def _mix_w(p, x, s):
    B, H, W, C = x.shape
    cs = C // s
    x5 = x.reshape(B, H, W, cs, s)
    w4 = p["weight"].reshape(W, s, W, s)
    y = jnp.einsum("bhwcs,klws->bhkcl", x5, w4, precision=nnf._prec())
    y = y + p["bias"].reshape(W, s)[None, None, :, None, :]
    return y.reshape(B, H, W, C)


def split_attention(p, branches):
    """vip.py:37-57 / s2_mlp_v2.py:31-51: softmax-over-k channel gating.

    The reference stacks the k branches into (B, k, H, W, C) purely for
    bookkeeping; that materializes k× the activation in HBM. Here the gate
    input is the running sum of the branches and the gated output a
    weighted sum over the unstacked branches — same math up to f32
    reassociation (strict-parity tested). Measured end-to-end on chip
    (ViP driver config): b32 2,877 → 3,721 (+29%), b64 4,754 → 5,047
    (+6%), b256 7,406 → 7,625 img/s vs the stacked form. (The
    per-block microbench in tools/vip_probe.py shows the opposite at b32 —
    in isolation XLA fuses the stacked reduce/gate well — but inside the
    full block stack the k× buffer loses; end-to-end numbers decide.)"""
    B, H, W, C = branches[0].shape
    k = len(branches)
    a = jnp.sum(sum(branches), axis=(1, 2))  # (B, C)
    hat = nnf.linear(p["mlp2"], nnf.gelu(nnf.linear(p["mlp1"], a)))
    bar = jax.nn.softmax(hat.reshape(B, k, C), axis=1)
    return sum(bar[:, i, None, None, :] * b for i, b in enumerate(branches))


def ViP(
    image_size=224,
    patch_size=16,
    in_channels=3,
    num_classes=1000,
    d_model=256,
    depth=30,
    segments=14,
    expansion_factor=4,
    weighted=True,
    block_runner=None,
    seed=0,
):
    image_size = pair(image_size)
    patch_size = pair(patch_size)
    assert d_model % segments == 0
    height = image_size[0] // patch_size[0]
    width = image_size[1] // patch_size[1]

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nnf.patch_embed(params["patcher"], x, patch_size)

        def block(bp, h):
            t, c = bp["0"], bp["1"]
            y = nnf.layer_norm(t["norm"], h)
            fns = t["fn"]["0"]["fns"]
            b1 = _mix_h(fns["0"]["1"], y, segments)
            b2 = _mix_w(fns["1"]["1"], y, segments)
            b3 = nnf.linear(fns["2"], y)
            if weighted:
                y = split_attention(t["fn"]["0"]["split_attention"], [b1, b2, b3])
            else:
                y = b1 + b2 + b3
            y = nnf.linear(t["fn"]["1"], y)
            h = h + y
            y = nnf.layer_norm(c["norm"], h)
            y = nnf.gelu(nnf.linear(c["fn"]["0"], y))
            y = nnf.linear(c["fn"]["3"], y)
            return h + y

        if block_runner is not None:
            x = block_runner(block, params["blocks"], x)
        else:
            x = nnf.scan_blocks(block, params["blocks"], x)
        x = nnf.layer_norm(params["head_norm"], x)
        x = jnp.mean(x, axis=(1, 2))
        return nnf.linear(params["head"], x)

    def _structure(nested):
        return {
            "patcher": nested["patcher"]["0"],
            "blocks": pytree.stack_numbered(nested["blocks"]["model"]),
            "head_norm": nested["mlp_head"]["0"],
            "head": nested["mlp_head"]["2"],
        }

    b = SDBuilder(seed)
    b.conv2d("patcher.0", in_channels, d_model, patch_size)
    for i in range(depth):
        pre = f"blocks.model.{i}"
        b.layer_norm(f"{pre}.0.norm", d_model)
        b.linear(f"{pre}.0.fn.0.fns.0.1", height * segments, height * segments)
        b.linear(f"{pre}.0.fn.0.fns.1.1", width * segments, width * segments)
        b.linear(f"{pre}.0.fn.0.fns.2", d_model, d_model)
        if weighted:
            b.linear(f"{pre}.0.fn.0.split_attention.mlp1", d_model, d_model, bias=False)
            b.linear(f"{pre}.0.fn.0.split_attention.mlp2", d_model, d_model * 3, bias=False)
        b.linear(f"{pre}.0.fn.1", d_model, d_model)
        b.layer_norm(f"{pre}.1.norm", d_model)
        b.linear(f"{pre}.1.fn.0", d_model, d_model * expansion_factor)
        b.linear(f"{pre}.1.fn.3", d_model * expansion_factor, d_model)
    b.layer_norm("mlp_head.0", d_model)
    b.linear("mlp_head.2", d_model, num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("vip", apply, params, importer=_structure,
                 init_sd=b.sd)
