"""GFNet / GFNetPyramid, TPU-native.

Reference semantics: /root/reference/models_pytorch/gfnet.py — GlobalFilter
(ln 47-72): rfft2 over the token grid (norm='ortho'), elementwise multiply by a
learned complex weight (h, w, dim, 2), irfft2 back. Block (ln 74-87): ONE
residual wraps filter+MLP: x + MLP(LN2(filter(LN1(x)))); BlockLayerScale adds
gamma (ln 89-104). GFNet is flat ViT-style with pos_embed (ln 147-261);
GFNetPyramid stacks 4 stages with DownLayer stride-2 convs and LayerScale
blocks (ln 264-389). LN eps 1e-6.

The cuFFT dependency ("no fft in Jittor", README.md:174-177) maps to XLA's
native FFT via jnp.fft.rfft2/irfft2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..utils import pair


def global_filter(p, x, a, b):
    """x: (B, N, C) on an a×b grid (gfnet.py:47-72: rfft2 → learned complex
    weight → irfft2, norm='ortho').

    The whole op is, per channel, a circular convolution with the kernel
    k = irfft2(W) (convolution theorem; the ortho scalings cancel). On TPU,
    XLA's FFT costs 1.59 ms/layer at 64×14×14×768 while the equivalent
    circulant matmul runs on the MXU in ~0.2 ms, so for small grids we
    materialize the (N, N, C) circulant from k — still a function of the
    complex_weight param, so gradients flow for training — and contract it
    with x. Large grids (GFNetPyramid's 56²/28² stages, where the circulant
    would be GBs) keep the FFT path.
    """
    B, N, C = x.shape
    w = p["complex_weight"]
    # circulant materialization pays only for small grids: measured win at
    # 14² (N=196; 2,182 → 2,915 img/s for GFNet-B) but a LOSS at the 28²
    # pyramid stage (1,349 → 1,088 — the 236 MB/layer circulant build beats
    # the matmul savings), so the threshold stays at N ≤ 256.
    if N <= 256:
        k = jnp.fft.irfft2(
            w[..., 0].astype(jnp.float32) + 1j * w[..., 1].astype(jnp.float32),
            s=(a, b), axes=(0, 1),
        )  # (a, b, C) spatial kernel
        ph, qh = np.arange(a)[:, None], np.arange(a)[None, :]
        pw, qw = np.arange(b)[:, None], np.arange(b)[None, :]
        dh = (ph - qh) % a  # (a, a) static
        dw = (pw - qw) % b  # (b, b) static
        m = k[dh[:, None, :, None], dw[None, :, None, :]]  # (a, b, a, b, C)
        m = m.reshape(N, N, C).astype(x.dtype)
        return jnp.einsum(
            "bqc,pqc->bpc", x, m, preferred_element_type=jnp.float32,
            precision=nnf._prec(),
        ).astype(x.dtype)
    y = x.reshape(B, a, b, C).astype(jnp.float32)
    y = jnp.fft.rfft2(y, axes=(1, 2), norm="ortho")
    y = y * (w[..., 0] + 1j * w[..., 1])
    y = jnp.fft.irfft2(y, s=(a, b), axes=(1, 2), norm="ortho")
    return y.reshape(B, N, C).astype(x.dtype)


def _block(bp, x, a, b, gamma=False, train=False, rng=None):
    y = nnf.layer_norm(bp["norm1"], x, eps=1e-6)
    y = global_filter(bp["filter"], y, a, b)
    y = nnf.layer_norm(bp["norm2"], y, eps=1e-6)
    y = nnf.linear(bp["mlp"]["fc2"], nnf.gelu(nnf.linear(bp["mlp"]["fc1"], y)))
    if gamma:
        y = bp["gamma"] * y
    if train and rng is not None and "_dpr" in bp:
        y = nnf.drop_path(rng, y, bp["_dpr"], train)
    return x + y


def GFNet(
    img_size=224,
    patch_size=16,
    in_chans=3,
    num_classes=1000,
    embed_dim=768,
    depth=12,
    mlp_ratio=4.0,
    representation_size=None,
    uniform_drop=False,
    drop_rate=0.0,
    drop_path_rate=0.0,
    norm_layer=None,
    dropcls=0,
    seed=0,
):
    img_size = pair(img_size)
    patch_size = pair(patch_size)
    grid = img_size[0] // patch_size[0]
    num_patches = grid * (img_size[1] // patch_size[1])
    h = grid
    w = h // 2 + 1

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nnf.patch_embed(params["patch_embed"], x, patch_size)
        B = x.shape[0]
        x = x.reshape(B, num_patches, embed_dim)
        x = x + params["pos_embed"]

        def block(bp, hcar, r):
            return _block(bp, hcar, grid, grid, train=train, rng=r)

        x = nnf.scan_blocks_rng(block, params["blocks"], x, rng if train else None)
        x = nnf.layer_norm(params["norm"], x, eps=1e-6)
        x = jnp.mean(x, axis=1)
        if "pre_logits" in params:
            x = jnp.tanh(nnf.linear(params["pre_logits"]["fc"], x))
        return nnf.linear(params["head"], x)

    import numpy as _np

    dpr = (
        _np.full(depth, drop_path_rate, dtype=_np.float32)
        if uniform_drop
        else _np.linspace(0, drop_path_rate, depth, dtype=_np.float32)
    )

    def _structure(nested):
        blocks = pytree.stack_numbered(nested["blocks"])
        blocks["_dpr"] = jnp.asarray(dpr)
        out = {
            "patch_embed": nested["patch_embed"]["proj"],
            "pos_embed": nested["pos_embed"],
            "blocks": blocks,
            "norm": nested["norm"],
            "head": nested["head"],
        }
        if "pre_logits" in nested:
            out["pre_logits"] = nested["pre_logits"]
        return out

    b = SDBuilder(seed)
    b.conv2d("patch_embed.proj", in_chans, embed_dim, patch_size)
    b.trunc_normal_("pos_embed", (1, num_patches, embed_dim), std=0.02)
    for i in range(depth):
        pre = f"blocks.{i}"
        b.layer_norm(f"{pre}.norm1", embed_dim)
        b.param(
            f"{pre}.filter.complex_weight",
            b.rng.standard_normal((h, w, embed_dim, 2)).astype("float32") * 0.02,
        )
        b.layer_norm(f"{pre}.norm2", embed_dim)
        b.linear(f"{pre}.mlp.fc1", embed_dim, int(embed_dim * mlp_ratio))
        b.linear(f"{pre}.mlp.fc2", int(embed_dim * mlp_ratio), embed_dim)
    b.layer_norm("norm", embed_dim)
    if representation_size:
        b.linear("pre_logits.fc", embed_dim, representation_size)
        b.linear("head", representation_size, num_classes)
    else:
        b.linear("head", embed_dim, num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("gfnet", apply, params, importer=_structure,
                 init_sd=b.sd)


def GFNetPyramid(
    img_size=224,
    patch_size=4,
    num_classes=1000,
    embed_dim=[64, 128, 256, 512],
    depth=[2, 2, 10, 4],
    mlp_ratio=[4, 4, 4, 4],
    drop_rate=0.0,
    drop_path_rate=0.0,
    norm_layer=None,
    init_values=0.001,
    no_layerscale=False,
    dropcls=0,
    seed=0,
):
    sizes = [56 * img_size // 224, 28 * img_size // 224, 14 * img_size // 224, 7 * img_size // 224]

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        B = x.shape[0]
        for i in range(4):
            if i == 0:
                x = nnf.patch_embed(params["patch_embed"][0], x, patch_size)
                x = x.reshape(B, sizes[0] * sizes[0], embed_dim[0])
                x = x + params["pos_embed"]
            else:
                x = x.reshape(B, sizes[i - 1], sizes[i - 1], embed_dim[i - 1])
                x = nnf.patch_embed(params["patch_embed"][i], x, 2)
                x = x.reshape(B, sizes[i] * sizes[i], embed_dim[i])

            def block(bp, hcar, r):
                return _block(bp, hcar, sizes[i], sizes[i],
                              gamma=not no_layerscale, train=train, rng=r)

            x = nnf.scan_blocks_rng(
                block, params["blocks"][i], x, rng if train else None
            )
        x = nnf.layer_norm(params["norm"], x, eps=1e-6)
        x = jnp.mean(x, axis=1)
        return nnf.linear(params["head"], x)

    import numpy as _np

    dpr_all = _np.linspace(0, drop_path_rate, sum(depth), dtype=_np.float32)

    def _stack_stage(nested, i):
        blocks = pytree.stack_numbered(nested["blocks"][str(i)])
        off = sum(depth[:i])
        blocks["_dpr"] = jnp.asarray(dpr_all[off : off + depth[i]])
        return blocks

    def _structure(nested):
        return {
            "patch_embed": [
                nested["patch_embed"][str(i)]["proj"] for i in range(4)
            ],
            "pos_embed": nested["pos_embed"],
            "blocks": [_stack_stage(nested, i) for i in range(4)],
            "norm": nested["norm"],
            "head": nested["head"],
        }

    b = SDBuilder(seed)
    b.conv2d("patch_embed.0.proj", 3, embed_dim[0], patch_size)
    for i in range(3):
        b.conv2d(f"patch_embed.{i + 1}.proj", embed_dim[i], embed_dim[i + 1], 2)
    b.trunc_normal_("pos_embed", (1, sizes[0] * sizes[0], embed_dim[0]), std=0.02)
    for i in range(4):
        h = sizes[i]
        w = h // 2 + 1
        for j in range(depth[i]):
            pre = f"blocks.{i}.{j}"
            b.layer_norm(f"{pre}.norm1", embed_dim[i])
            b.param(
                f"{pre}.filter.complex_weight",
                b.rng.standard_normal((h, w, embed_dim[i], 2)).astype("float32") * 0.02,
            )
            b.layer_norm(f"{pre}.norm2", embed_dim[i])
            b.linear(f"{pre}.mlp.fc1", embed_dim[i], int(embed_dim[i] * mlp_ratio[i]))
            b.linear(f"{pre}.mlp.fc2", int(embed_dim[i] * mlp_ratio[i]), embed_dim[i])
            if not no_layerscale:
                b.const(f"{pre}.gamma", (embed_dim[i],), init_values)
    b.layer_norm("norm", embed_dim[-1])
    b.linear("head", embed_dim[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("gfnet_pyramid", apply, params, importer=_structure,
                 init_sd=b.sd)
