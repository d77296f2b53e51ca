"""ActiveMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/active_mlp.py — ATMOp
(ln 37-81): deform_conv2d with a 1x1 weight and LEARNED float offsets along one
axis; offsets generated every ``intv`` blocks by an offset_layer and shared
across ``share_dim`` channels via repeat_interleave (ln 152-166, 330-339); PEG
depthwise positional conv before each offset-generating block (ln 202-224,
330-339); three-branch (w, h, channel) softmax fusion (ln 94-127); overlap
stem, per-stage Downsample attached to the LAST block of a stage (ln 292).
Factories ActiveSmall/Base/Large (+Tiny variants) (ln 359-411).

The learned-offset gather is a per-channel 1-D bilinear sample
(ops/deform.atm_op).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..ops.deform import atm_op


def _offset_bound(op):
    """Provable data-independent bound on max |offset| out of an offset_layer
    (LayerNorm → Linear), computed from concrete params.

    offset_k = W_k · (γ ⊙ ŷ + β) + b_k where ŷ is the LN-normalized vector:
    zero mean, ‖ŷ‖₂ = √(C·σ²/(σ²+eps)) ≤ √C. Cauchy-Schwarz on the
    zero-mean component (ŷ ⊥ 1, so the mean of W_k⊙γ drops out):
        |offset_k| ≤ ‖(W_k⊙γ) − mean(W_k⊙γ)‖₂ · √C + |W_k·β + b_k|
    Valid for ANY input, so a banded sampler with band ≥ this bound is
    exactly the dense hat contraction. Returns None when the leaves are not
    concrete float arrays (e.g. the export tracer's index-tagged int64s)."""
    try:
        g = np.asarray(op["0"]["weight"]).astype(np.float64)
        beta = np.asarray(op["0"]["bias"]).astype(np.float64)
        W = np.asarray(op["1"]["weight"]).astype(np.float64)
        b = np.asarray(op["1"]["bias"]).astype(np.float64)
    except (TypeError, ValueError):  # traced / abstract leaves
        return None
    if not np.issubdtype(np.asarray(op["1"]["weight"]).dtype, np.floating):
        return None
    v = W * g[None, :]
    v = v - v.mean(axis=1, keepdims=True)
    C = g.shape[0]
    bound = np.linalg.norm(v, axis=1) * np.sqrt(C) + np.abs(W @ beta + b)
    return float(bound.max())


# Measured engage-everywhere crossover for offset_band="auto" (see _eff_band):
# at-or-above this trace-time batch the banded sampler engages at EVERY stage
# (the exact path's hat-matrix HBM intermediate dominates); below it only
# where the tap chain is shorter than the contraction axis. Chip A/B at
# b ∈ {1, 8, 64, 128, 256} in docs/PERFORMANCE.md.
_ENGAGE_ALL_MIN_BATCH = 128


def _atm_layer(bp, x, offset, dim, share=1, band=None, saturate=True):
    C = dim
    w = atm_op(bp["atm_w"], x, offset[..., :C], "w", share=share, band=band,
               saturate=saturate)
    h = atm_op(bp["atm_h"], x, offset[..., C:], "h", share=share, band=band,
               saturate=saturate)
    c = nnf.linear(bp["atm_c"], x)
    B = x.shape[0]
    a = jnp.mean(w + h + c, axis=(1, 2))
    a = nnf.linear(bp["fusion"]["fc2"], nnf.gelu(nnf.linear(bp["fusion"]["fc1"], a)))
    a = nnf.softmax(a.reshape(B, C, 3).transpose(2, 0, 1), axis=0)
    a = a[:, :, None, None, :]
    y = w * a[0] + h * a[1] + c * a[2]
    return nnf.linear(bp["proj"], y)


def ActiveMLP(
    img_size=224,
    patch_size=4,
    in_chans=3,
    num_classes=1000,
    depths=[2, 2, 4, 2],
    embed_dims=[64, 128, 320, 512],
    mlp_ratios=[4, 4, 4, 4],
    share_dims=[1, 1, 1, 1],
    drop_path_rate=0.0,
    intv=2,
    seed=0,
    offset_band="auto",
    **kwargs,
):
    """``offset_band`` selects the ATM sampler lowering:

    - ``"auto"`` (default): per offset-layer, compute the provable
      max-|offset| bound from the concrete params (_offset_bound) at build
      and at every ``load_torch_state_dict``; in eval, use the UNCLAMPED
      banded sampler at band = min(⌈bound⌉, n−1) — exact for any offsets
      (taps |d| ≥ n contribute nothing, and in-bound offsets never reach
      the cap; see _hat_sample_1d_banded ``saturate=False``). Training and
      unresolvable layers keep the dense hat contraction, so semantics
      never change anywhere.
    - ``D`` (int): force the banded sampler everywhere
      (ops/deform._hat_sample_1d_banded): identical outputs whenever every
      learned offset lies in [-D, D] (out-of-band offsets saturate at ±D),
      at O(D) elementwise cost instead of an O(H) MXU contraction.
    - ``None``: always the exact hat contraction."""
    n_stages = len(depths)

    import numpy as _np

    dpr_all = _np.linspace(0, drop_path_rate, sum(depths), dtype=_np.float32)

    # (stage, block) of each offset-generating block → provable |offset| bound
    _bounds = {}

    def _resolve_bounds(params):
        for i in range(n_stages):
            for j in range(depths[i]):
                if j % intv == 0 and j != depths[i] - 1:
                    bound = _offset_bound(params["blocks"][i][j]["offset_layer"])
                    if bound is not None:
                        _bounds[(i, j)] = bound

    def _eff_band(i, j, H, W, B, train):
        """(band, saturate) for the blocks consuming offset-layer (i, j)."""
        if offset_band != "auto":
            return offset_band, True
        if train:
            # params move during training; bounds would go stale
            return None, True
        bound = _bounds.get((i, j))
        if bound is None or not _np.isfinite(bound):
            return None, True
        # +5% headroom: the bound assumes exact arithmetic; bf16 LN/matmul
        # rounding in the offset computation is well inside this margin.
        # saturate=False: no clamp + per-axis n−1 tap cap inside the
        # sampler keep this exact even where ⌈bound⌉ exceeds the cap.
        band = max(1, int(_np.ceil(bound * 1.05)))
        # Engagement is a pure perf choice (both paths are exact). Two
        # regimes, measured on chip (ActivexTiny, docs/PERFORMANCE.md):
        # - small batch: the banded path's 2·band+1 serial VPU shift-FMAs
        #   only beat the exact n-wide MXU contraction where the chain is
        #   shorter than the axis (init bounds give bands 6/8/12/15 at the
        #   56/28/14/7 stages → engage the two high-res stages only).
        #   Engaging everywhere costs b1 1,824 → 966 and b8 2,452 → 1,240.
        # - large batch: the exact path's (B,H,W,g,n) hat-matrix HBM
        #   intermediate dominates; engaging every stage wins (b256
        #   2,252 → 3,161). B is static at trace time, so the rule keys
        #   on it directly.
        n = min(H, W)
        if B < _ENGAGE_ALL_MIN_BATCH and 2 * min(band, n - 1) + 1 > n:
            return None, True
        return band, False

    def apply(params, x, train=False, rng=None):
        import jax as _jax

        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nnf.conv2d(params["patch_embed"], x, stride=4, padding=2)
        offset = None
        cur_band, cur_sat = None, True
        for i in range(n_stages):
            dim = embed_dims[i]
            for j in range(depths[i]):
                gidx = sum(depths[:i]) + j
                if rng is not None and train:
                    r1, r2 = _jax.random.split(_jax.random.fold_in(rng, gidx))
                else:
                    r1 = r2 = None
                dprv = float(dpr_all[gidx])
                bp = params["blocks"][i][j]
                if j % intv == 0 and j != depths[i] - 1:
                    # PEG, then generate new offsets (active_mlp.py:330-339)
                    peg = params["pos_blocks"][i]
                    x = nnf.conv2d(peg, x, padding=1, groups=dim) + x
                    o = nnf.layer_norm(bp["offset_layer"]["0"], x)
                    o = nnf.linear(bp["offset_layer"]["1"], o)
                    offset = jnp.repeat(o, share_dims[i], axis=-1)
                    cur_band, cur_sat = _eff_band(
                        i, j, x.shape[1], x.shape[2], x.shape[0], train)
                y = nnf.layer_norm(bp["norm1"], x)
                y = _atm_layer(bp["atm"], y, offset, dim,
                               share=share_dims[i], band=cur_band,
                               saturate=cur_sat)
                x = x + nnf.drop_path(r1, y, dprv, train)
                y = nnf.layer_norm(bp["norm2"], x)
                y = nnf.linear(bp["mlp"]["fc2"], nnf.gelu(nnf.linear(bp["mlp"]["fc1"], y)))
                x = x + nnf.drop_path(r2, y, dprv, train)
                if "downsample" in bp:
                    x = nnf.conv2d(bp["downsample"]["proj"], x, stride=2, padding=1)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nnf.layer_norm(params["norm"], x)
        x = jnp.mean(x, axis=1)
        return nnf.linear(params["head"], x)

    def _structure(nested):
        blocks = []
        for i in range(n_stages):
            st = nested["blocks"][str(i)]
            blocks.append([st[str(j)] for j in range(depths[i])])
        return {
            "patch_embed": nested["patch_embed"]["proj"],
            "blocks": blocks,
            "pos_blocks": [
                nested["pos_blocks"][str(i)]["proj"] for i in range(n_stages)
            ],
            "norm": nested["norm"],
            "head": nested["head"],
        }

    b = SDBuilder(seed)
    b.conv2d("patch_embed.proj", in_chans, embed_dims[0], 7)
    for i in range(n_stages):
        d = embed_dims[i]
        for j in range(depths[i]):
            pre = f"blocks.{i}.{j}"
            b.layer_norm(f"{pre}.norm1", d)
            b.linear(f"{pre}.atm.atm_c", d, d, bias=False)
            b.conv2d(f"{pre}.atm.atm_h", d, d, 1)
            b.conv2d(f"{pre}.atm.atm_w", d, d, 1)
            b.linear(f"{pre}.atm.fusion.fc1", d, d // 4)
            b.linear(f"{pre}.atm.fusion.fc2", d // 4, d * 3)
            b.linear(f"{pre}.atm.proj", d, d)
            b.layer_norm(f"{pre}.norm2", d)
            b.linear(f"{pre}.mlp.fc1", d, int(d * mlp_ratios[i]))
            b.linear(f"{pre}.mlp.fc2", int(d * mlp_ratios[i]), d)
            if j % intv == 0 and j != depths[i] - 1:
                b.layer_norm(f"{pre}.offset_layer.0", d)
                b.linear(f"{pre}.offset_layer.1", d, d * 2 // share_dims[i])
            if i < n_stages - 1 and j == depths[i] - 1:
                b.conv2d(f"{pre}.downsample.proj", d, embed_dims[i + 1], 3)
        b.conv2d(f"pos_blocks.{i}.proj", d, d, 3, groups=d)
    b.layer_norm("norm", embed_dims[-1])
    b.linear("head", embed_dims[-1], num_classes)
    params = _structure(pytree.nest(b.sd))
    _resolve_bounds(params)

    def _import(nested):
        p = _structure(nested)
        _resolve_bounds(p)  # no-op on the export tracer's tagged int arrays
        return p

    return Model("active_mlp", apply, params, importer=_import,
                 init_sd=b.sd)


def ActivexTiny(pretrained=False, **kwargs):
    return ActiveMLP(depths=[2, 2, 4, 2], mlp_ratios=[4, 4, 4, 4],
                     embed_dims=[64, 128, 320, 512], share_dims=[2, 4, 4, 8],
                     intv=2, **kwargs)


def ActiveTiny(pretrained=False, **kwargs):
    return ActiveMLP(depths=[2, 3, 10, 3], mlp_ratios=[4, 4, 4, 4],
                     embed_dims=[64, 128, 320, 512], share_dims=[2, 4, 4, 8],
                     intv=2, **kwargs)


def ActiveSmall(pretrained=False, **kwargs):
    return ActiveMLP(depths=[3, 4, 18, 3], mlp_ratios=[8, 8, 4, 4],
                     embed_dims=[64, 128, 320, 512], share_dims=[2, 4, 4, 8],
                     intv=6, **kwargs)


def ActiveBase(pretrained=False, **kwargs):
    return ActiveMLP(depths=[3, 8, 27, 3], mlp_ratios=[8, 8, 4, 4],
                     embed_dims=[64, 128, 320, 512], share_dims=[2, 4, 4, 8],
                     intv=6, **kwargs)


def ActiveLarge(pretrained=False, **kwargs):
    return ActiveMLP(depths=[3, 4, 24, 3], mlp_ratios=[4, 4, 4, 4],
                     embed_dims=[96, 192, 384, 768], share_dims=[2, 4, 4, 8],
                     intv=6, **kwargs)
