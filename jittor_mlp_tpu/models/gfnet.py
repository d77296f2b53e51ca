"""GFNet / GFNetPyramid, TPU-native.

Reference semantics: /root/reference/models_pytorch/gfnet.py — GlobalFilter
(ln 47-72): rfft2 over the token grid (norm='ortho'), elementwise multiply by a
learned complex weight (h, w, dim, 2), irfft2 back. Block (ln 74-87): ONE
residual wraps filter+MLP: x + MLP(LN2(filter(LN1(x)))); BlockLayerScale adds
gamma (ln 89-104). GFNet is flat ViT-style with pos_embed (ln 147-261);
GFNetPyramid stacks 4 stages with DownLayer stride-2 convs and LayerScale
blocks (ln 264-389). LN eps 1e-6.

The cuFFT dependency ("no fft in Jittor", README.md:174-177) maps to per-axis
DFT matmuls on the MXU (global_filter below) — XLA's native TPU FFT measured
6.5-10x slower at the pyramid's 56²/28² grids.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..utils import pair


from functools import lru_cache


@lru_cache(maxsize=None)
def _dft_mats(a, b):
    """Static ortho DFT matrices factoring rfft2/irfft2 into per-axis matmuls.

    Returns (fw_r, fw_i, iw_r, iw_i, fh_r, fh_i) as f32 numpy: W-axis rDFT
    (b, b//2+1) forward and its Hermitian-folded inverse (b//2+1, b) with the
    2×/1× symmetry coefficients baked in, and the symmetric H-axis DFT (a, a).
    """
    bw = b // 2 + 1
    n = np.arange(b)[:, None]
    k = np.arange(bw)[None, :]
    ang = 2 * np.pi * n * k / b
    fw_r = (np.cos(ang) / np.sqrt(b)).astype(np.float32)
    fw_i = (-np.sin(ang) / np.sqrt(b)).astype(np.float32)
    # Hermitian fold: y[n] = Σ_k c_k (gr cos − gi sin)/√b, c = 1 at DC/Nyquist
    c = np.where(
        (k.ravel() == 0) | ((b % 2 == 0) & (k.ravel() == b // 2)), 1.0, 2.0
    )[:, None]
    angi = 2 * np.pi * np.arange(bw)[:, None] * np.arange(b)[None, :] / b
    iw_r = (c * np.cos(angi) / np.sqrt(b)).astype(np.float32)
    iw_i = (-c * np.sin(angi) / np.sqrt(b)).astype(np.float32)
    p_ = np.arange(a)[:, None]
    q_ = np.arange(a)[None, :]
    ah = 2 * np.pi * p_ * q_ / a
    fh_r = (np.cos(ah) / np.sqrt(a)).astype(np.float32)
    fh_i = (-np.sin(ah) / np.sqrt(a)).astype(np.float32)
    return fw_r, fw_i, iw_r, iw_i, fh_r, fh_i


def global_filter(p, x, a, b):
    """x: (B, N, C) on an a×b grid (gfnet.py:47-72: rfft2 → learned complex
    weight → irfft2, norm='ortho').

    XLA's TPU FFT is slow (4.3 ms/layer at 64×56²×96, 2.1 ms at 64×28²×192),
    so the transform is factored into per-axis DFT matmuls that ride the MXU:
    rDFT along W (2 real matmuls), DFT along H (4), learned complex multiply,
    F^H along H (4), Hermitian-folded irDFT along W (2) — measured 0.66 ms /
    0.21 ms on those shapes, and it also edges out the (N, N, C) circulant
    previously used for small grids (0.033 vs 0.052 ms at 14²×384; the
    circulant is GBs at 56²). Exact to 9e-8 vs the FFT at high precision
    (tools/gfnet_profile.py), and plain einsums, so gradients flow to
    complex_weight.
    """
    B, N, C = x.shape
    w = p["complex_weight"]
    f = x.dtype
    # f32 callers got exact-FFT accuracy before this lowering; keep that
    # contract by running the transform matmuls at HIGHEST precision (TPU
    # default f32 matmul is a fast bf16-pass mode — 3.8e-3 max-abs/layer at
    # 56²). bf16 callers keep the fast path: end-to-end on GFNet-H-B the
    # bf16 spectral error is 4.4e-3 max-abs with 100% argmax/top-5
    # agreement vs the f32 forward — inside the zoo-wide bf16 contract.
    prec = "highest" if f == jnp.float32 else nnf._prec()
    fw_r, fw_i, iw_r, iw_i, fh_r, fh_i = (
        jnp.asarray(m, f) for m in _dft_mats(a, b)
    )
    wr = w[..., 0].astype(f)
    wi = w[..., 1].astype(f)
    x4 = x.reshape(B, a, b, C)
    e = lambda s, u, v: jnp.einsum(s, u, v, precision=prec)
    xr = e("bhwc,wk->bhkc", x4, fw_r)
    xi = e("bhwc,wk->bhkc", x4, fw_i)
    yr = e("bhkc,hp->bpkc", xr, fh_r) - e("bhkc,hp->bpkc", xi, fh_i)
    yi = e("bhkc,hp->bpkc", xr, fh_i) + e("bhkc,hp->bpkc", xi, fh_r)
    zr = yr * wr - yi * wi
    zi = yr * wi + yi * wr
    # inverse H DFT is F^H = conj(F)ᵀ; F is symmetric so only conj remains
    gr = e("bpkc,ph->bhkc", zr, fh_r) + e("bpkc,ph->bhkc", zi, fh_i)
    gi = e("bpkc,ph->bhkc", zi, fh_r) - e("bpkc,ph->bhkc", zr, fh_i)
    y = e("bhkc,kw->bhwc", gr, iw_r) + e("bhkc,kw->bhwc", gi, iw_i)
    return y.reshape(B, N, C)


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
