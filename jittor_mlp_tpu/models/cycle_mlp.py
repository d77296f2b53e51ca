"""CycleMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/cycle_mlp.py — CycleFC
(ln 54-144) applies a 1x1 weight through deform_conv2d with a fixed cyclic
integer offset buffer (ln 106-122); CycleMLP mixes three branches (h: (1,3)
staircase, w: (3,1) staircase, channel Linear) with a softmax reweight MLP
(ln 147-174); CycleBlocks with skip_lam (ln 177-196); overlap patch stem
7/4/2, stride-2 conv transitions; LN → token mean → head. Factories B1..B5
(ln 352-409).

The deformable call disappears on TPU: offsets are compile-time constants, so
CycleFC lowers to K masked-weight matmuls over static shifts (ops/deform).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..ops.deform import cycle_fc


def _gen_offset(c, kh, kw):
    """The reference's registered offset buffer (cycle_mlp.py:106-122),
    shape (1, 2c, 1, 1) with (Δy, Δx) interleaved per channel. Our forward
    recomputes these statically (ops/deform.cycle_fc), but the buffer lives in
    init_sd so the torch-export roundtrip emits it bit-exact."""
    off = np.zeros((1, 2 * c, 1, 1), np.float32)
    start = (kh * kw) // 2
    for i in range(c):
        if kh == 1:
            off[0, 2 * i + 1] = (i + start) % kw - kw // 2
        else:
            off[0, 2 * i] = (i + start) % kh - kh // 2
    return off


def _cycle_mlp_branch(bp, x, dim):
    h = cycle_fc(bp["sfc_h"], x, (1, 3))
    w = cycle_fc(bp["sfc_w"], x, (3, 1))
    c = nnf.linear(bp["mlp_c"], x)
    B = x.shape[0]
    a = jnp.mean(h + w + c, axis=(1, 2))
    a = nnf.linear(bp["reweight"]["fc2"], nnf.gelu(nnf.linear(bp["reweight"]["fc1"], a)))
    a = nnf.softmax(a.reshape(B, dim, 3).transpose(2, 0, 1), axis=0)
    a = a[:, :, None, None, :]
    y = h * a[0] + w * a[1] + c * a[2]
    return nnf.linear(bp["proj"], y)


def CycleNet(
    layers,
    img_size=224,
    patch_size=4,
    in_chans=3,
    num_classes=1000,
    embed_dims=None,
    transitions=None,
    segment_dim=None,
    mlp_ratios=None,
    skip_lam=1.0,
    qkv_bias=False,
    drop_path_rate=0.0,
    fork_feat=False,
    seed=0,
    **kwargs,
):
    n_stages = len(layers)
    # network index layout mirrors the reference ModuleList: stages at even
    # slots, Downsample transitions between (cycle_mlp.py:260-272)
    net_idx = []
    idx = 0
    for i in range(n_stages):
        net_idx.append(idx)
        idx += 1
        if i < n_stages - 1 and (transitions[i] or embed_dims[i] != embed_dims[i + 1]):
            idx += 1

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nnf.conv2d(params["patch_embed"], x, stride=4, padding=2)
        for i in range(n_stages):
            st = params["stages"][i]
            dim = embed_dims[i]

            def block(bp, h, r):
                import jax as _jax

                r1, r2 = (None, None) if r is None else _jax.random.split(r)
                y = nnf.layer_norm(bp["norm1"], h)
                y = _cycle_mlp_branch(bp["attn"], y, dim)
                h = h + nnf.drop_path(r1, y, bp["_dpr"], train) / skip_lam
                y = nnf.layer_norm(bp["norm2"], h)
                y = nnf.linear(bp["mlp"]["fc2"], nnf.gelu(nnf.linear(bp["mlp"]["fc1"], y)))
                return h + nnf.drop_path(r2, y, bp["_dpr"], train) / skip_lam

            x = nnf.scan_blocks_rng(block, st["blocks"], x, rng if train else None)
            if "down" in st:
                x = nnf.conv2d(st["down"], x, stride=2, padding=1)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nnf.layer_norm(params["norm"], x)
        x = jnp.mean(x, axis=1)
        return nnf.linear(params["head"], x)

    import numpy as _np

    total = sum(layers)

    def _block_dpr(i, j):
        # cycle_mlp.py:238 decay rule
        return drop_path_rate * (j + sum(layers[:i])) / max(total - 1, 1)

    def _structure(nested):
        stages = []
        for i in range(n_stages):
            blocks_in = nested["network"][str(net_idx[i])]
            # the offset buffers live in init_sd only for the torch-export
            # roundtrip; keep them OUT of params (the forward recomputes the
            # offsets statically) so they are neither trainable (AdamW decay
            # would corrupt the export template) nor counted as parameters
            for j in blocks_in.values():
                for sfc in ("sfc_h", "sfc_w"):
                    j["attn"][sfc].pop("offset", None)
            entry = {"blocks": pytree.stack_numbered(blocks_in)}
            entry["blocks"]["_dpr"] = jnp.asarray(
                _np.array([_block_dpr(i, j) for j in range(layers[i])], _np.float32)
            )
            if i < n_stages - 1 and (
                transitions[i] or embed_dims[i] != embed_dims[i + 1]
            ):
                entry["down"] = nested["network"][str(net_idx[i] + 1)]["proj"]
            stages.append(entry)
        return {
            "patch_embed": nested["patch_embed"]["proj"],
            "stages": stages,
            "norm": nested["norm"],
            "head": nested["head"],
        }

    b = SDBuilder(seed)
    b.conv2d("patch_embed.proj", in_chans, embed_dims[0], 7)
    for i in range(n_stages):
        d = embed_dims[i]
        for j in range(layers[i]):
            pre = f"network.{net_idx[i]}.{j}"
            b.layer_norm(f"{pre}.norm1", d)
            b.linear(f"{pre}.attn.mlp_c", d, d, bias=qkv_bias)
            for sfc, (kh, kw) in (("sfc_h", (1, 3)), ("sfc_w", (3, 1))):
                b.conv2d(f"{pre}.attn.{sfc}", d, d, 1)
                b.param(f"{pre}.attn.{sfc}.offset", _gen_offset(d, kh, kw))
            b.linear(f"{pre}.attn.reweight.fc1", d, d // 4)
            b.linear(f"{pre}.attn.reweight.fc2", d // 4, d * 3)
            b.linear(f"{pre}.attn.proj", d, d)
            b.layer_norm(f"{pre}.norm2", d)
            b.linear(f"{pre}.mlp.fc1", d, int(d * mlp_ratios[i]))
            b.linear(f"{pre}.mlp.fc2", int(d * mlp_ratios[i]), d)
        if i < n_stages - 1 and (transitions[i] or embed_dims[i] != embed_dims[i + 1]):
            b.conv2d(f"network.{net_idx[i] + 1}.proj", d, embed_dims[i + 1], 3)
    b.layer_norm("norm", embed_dims[-1])
    b.linear("head", embed_dims[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("cycle_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)


def _factory(layers, mlp_ratios, embed_dims, **kwargs):
    transitions = [True, True, True, True]
    return CycleNet(
        layers,
        embed_dims=embed_dims,
        patch_size=7,
        transitions=transitions,
        mlp_ratios=mlp_ratios,
        **kwargs,
    )


def CycleMLP_B1(pretrained=False, **kwargs):
    return _factory([2, 2, 4, 2], [4, 4, 4, 4], [64, 128, 320, 512], **kwargs)


def CycleMLP_B2(pretrained=False, **kwargs):
    return _factory([2, 3, 10, 3], [4, 4, 4, 4], [64, 128, 320, 512], **kwargs)


def CycleMLP_B3(pretrained=False, **kwargs):
    return _factory([3, 4, 18, 3], [8, 8, 4, 4], [64, 128, 320, 512], **kwargs)


def CycleMLP_B4(pretrained=False, **kwargs):
    return _factory([3, 8, 27, 3], [8, 8, 4, 4], [64, 128, 320, 512], **kwargs)


def CycleMLP_B5(pretrained=False, **kwargs):
    return _factory([3, 4, 24, 3], [4, 4, 4, 4], [96, 192, 384, 768], **kwargs)
