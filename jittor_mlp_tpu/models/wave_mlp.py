"""WaveMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/wave_mlp.py — PATM
(ln 22-67): learned phase theta via 1x1 conv + BN + ReLU per direction;
amplitude 1x1 convs; expand to [x·cosθ, x·sinθ] on channels; token-fuse with
grouped Conv2d(2C→C, (1,7)/(7,1), groups=C, bias=False); three-branch softmax
reweight MLP on the pooled sum; 1x1 proj. BN-prenorm residual blocks (ln 70-82);
overlap stem 7/4/2, stride-2 downsamples, BN → GAP → head. Settings T/S/M.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model

wavemlp_settings = {
    "T": [[2, 2, 4, 2], [4, 4, 4, 4]],
    "S": [[2, 3, 10, 3], [4, 4, 4, 4]],
    "M": [[3, 4, 18, 3], [8, 8, 4, 4]],
}


_conv11 = nnf.conv1x1


def _tfc(p, x2, padding, dim):
    """Token-fuse conv: torch Conv2d(2C→C, (1,7)/(7,1), groups=C, bias=False).

    Torch group semantics (reference wave_mlp.py:30-33): group g consumes the
    *adjacent* concat channels (2g, 2g+1) → output channel g. A group-of-2
    grouped conv runs at 2/128 lane utilization on the TPU; splitting the
    input into its even/odd channel streams turns it into two full-C
    depthwise convs summed — exact up to one f32 reassociation. The
    isolated-op sweep (tools/b1_anatomy.py, docs/PERFORMANCE.md) measures
    the split faster at EVERY stage geometry and batch ∈ {1, 8, 64} — at
    b1 by 100–640× (grouped: 471–3,156µs per call vs ≤7µs; the four 7²
    tfc calls alone were ~1.8ms of wave_mlp's 1.88ms b1 budget) — so the
    split is unconditional. (Round 4 kept XLA grouped at H·W ≤ 64 off an
    end-to-end b64 delta that does not reproduce in isolation.)
    """
    B, H, W, _ = x2.shape
    w = p["weight"]  # torch OIHW: (C, 2, kh, kw)
    xp = x2.reshape(B, H, W, dim, 2)
    ye = nnf.conv2d({"weight": w[:, 0:1]}, xp[..., 0], padding=padding, groups=dim)
    yo = nnf.conv2d({"weight": w[:, 1:2]}, xp[..., 1], padding=padding, groups=dim)
    return ye + yo


def _patm(bp, x, dim, train):
    th = _conv11(bp["theta_h_conv"]["0"], x)
    th = nnf.relu(nnf.batch_norm(bp["theta_h_conv"]["1"], th, train=train))
    tw = _conv11(bp["theta_w_conv"]["0"], x)
    tw = nnf.relu(nnf.batch_norm(bp["theta_w_conv"]["1"], tw, train=train))

    x_h = _conv11(bp["fc_h"], x)
    x_w = _conv11(bp["fc_w"], x)
    c = _conv11(bp["fc_c"], x)

    x_h = jnp.concatenate([x_h * jnp.cos(th), x_h * jnp.sin(th)], axis=-1)
    x_w = jnp.concatenate([x_w * jnp.cos(tw), x_w * jnp.sin(tw)], axis=-1)

    h = _tfc(bp["tfc_h"], x_h, (0, 3), dim)
    w = _tfc(bp["tfc_w"], x_w, (3, 0), dim)

    a = jnp.mean(h + w + c, axis=(1, 2))  # (B, C)
    a = _conv11(
        bp["reweight"]["fc2"],
        nnf.gelu(_conv11(bp["reweight"]["fc1"], a[:, None, None, :])),
    )[:, 0, 0, :]
    B = x.shape[0]
    a = nnf.softmax(a.reshape(B, dim, 3).transpose(2, 0, 1), axis=0)  # (3,B,C)
    a = a[:, :, None, None, :]  # broadcast over H, W in NHWC
    y = h * a[0] + w * a[1] + c * a[2]
    return _conv11(bp["proj"], y)


def WaveMLP(model_name="T", pretrained=None, num_classes=1000, seed=0, **kwargs):
    assert model_name in wavemlp_settings
    layers, mlp_ratios = wavemlp_settings[model_name]
    embed_dims = [64, 128, 320, 512]
    n_stages = len(layers)

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        pe = params["patch_embed"]
        x = nnf.conv2d(pe["proj"], x, stride=4, padding=2)
        x = nnf.batch_norm(pe["norm"], x, train=train)
        for si in range(n_stages):
            st = params["stages"][si]
            d = embed_dims[si]

            def block(bp, h):
                y = nnf.batch_norm(bp["norm1"], h, train=train)
                y = _patm(bp["attn"], y, d, train)
                h = h + y
                y = nnf.batch_norm(bp["norm2"], h, train=train)
                y = _conv11(bp["mlp"]["fc2"], nnf.gelu(_conv11(bp["mlp"]["fc1"], y)))
                return h + y

            x = nnf.scan_blocks(block, st["blocks"], x)
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
            for fc in ("fc_h", "fc_w", "fc_c", "proj"):
                b.conv2d(f"{pre}.attn.{fc}", d, d, 1)
            b.conv2d(f"{pre}.attn.tfc_h", 2 * d, d, (1, 7), groups=d, bias=False)
            b.conv2d(f"{pre}.attn.tfc_w", 2 * d, d, (7, 1), groups=d, bias=False)
            b.conv2d(f"{pre}.attn.reweight.fc1", d, d // 4, 1)
            b.conv2d(f"{pre}.attn.reweight.fc2", d // 4, d * 3, 1)
            b.conv2d(f"{pre}.attn.theta_h_conv.0", d, d, 1)
            b.batch_norm(f"{pre}.attn.theta_h_conv.1", d)
            b.conv2d(f"{pre}.attn.theta_w_conv.0", d, d, 1)
            b.batch_norm(f"{pre}.attn.theta_w_conv.1", d)
            b.batch_norm(f"{pre}.norm2", d)
            b.conv2d(f"{pre}.mlp.fc1", d, int(d * mlp_ratios[si]), 1)
            b.conv2d(f"{pre}.mlp.fc2", int(d * mlp_ratios[si]), d, 1)
        if si + 1 < n_stages:
            b.conv2d(f"network.{2 * si + 1}.proj", d, embed_dims[si + 1], 3)
            b.batch_norm(f"network.{2 * si + 1}.norm", embed_dims[si + 1])
    b.batch_norm("norm", embed_dims[-1])
    b.linear("head", embed_dims[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    model = Model("wave_mlp", apply, params, importer=_structure,
                  init_sd=b.sd)
    if pretrained:
        from ..utils.checkpoint import load_torch_checkpoint

        model.load_torch_state_dict(load_torch_checkpoint(pretrained))
    return model
