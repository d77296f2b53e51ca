"""RaftMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/raft_mlp.py — four token
mixing modes selected by ``token_mixing_type`` (ln 23-28, 468-475):

- 'ser_pm' (default): serial permuted vertical/horizontal mixers where
  ``raft_size`` channels ride along the mixed spatial axis (PermutedBlock,
  ln 114-146, SerialPermutedLevel ln 302-382)
- 'sep_ln_codim_tm': axis mixers with LayerNorm over the full codimension
  (TokenBlock, ln 76-92, ln 168-232)
- 'sep_ln_ch_tm': axis mixers with LN over channels only
  (SpatiallySeparatedTokenBlock, ln 95-111, ln 235-299)
- 'original_tm': plain MLP-Mixer style (OriginalLevel, ln 385-437)

Levels rescale via bilinear interpolation when image size is not divisible by
the patch size (ln 157-165). Multi-level shortcut heads fuse with
``b[:, :D] * a + b[:, D:]`` gating in reverse order (ln 519-548).

Every einops Rearrange is a static reshape/transpose; all FF mixers are MXU
matmuls.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model

TOKEN_MIXING_TYPES = ["ser_pm", "sep_ln_codim_tm", "sep_ln_ch_tm", "original_tm"]


def _ff(p, x):
    """Block.fn: Linear → GELU → Linear over the last axis (raft_mlp.py:56-62)."""
    y = nnf.gelu(nnf.linear(p["0"], x))
    return nnf.linear(p["3"], y)


def _ln_axes(p, x, axes, wshape):
    """layer_norm normalizing ``axes`` of x in place (no transpose round
    trips — the relayout-folding pattern): same fp32-stats math as
    nnf.layer_norm, with the (reshaped) weight/bias broadcast onto ``axes``."""
    import jax

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=axes, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
    bshape = [1] * x.ndim
    for a, s in zip(axes, wshape):
        bshape[a] = s
    y = y * p["weight"].reshape(bshape).astype(x.dtype)
    y = y + p["bias"].reshape(bshape).astype(x.dtype)
    return y


def _token_block(bp, x, dp=None):
    """TokenBlock on (B, K, o): LN over K, FF over o, residual wrapped in
    DropPath (raft_mlp.py:64-65). LN normalizes axis 1 in place."""
    y = _ln_axes(bp["norm"]["1"], x, (1,), (x.shape[1],))
    return _dp(dp, _ff(bp["fn"], y)) + x


def _sep_token_block(bp, x, channels, dim, dp=None):
    """SpatiallySeparatedTokenBlock on (B, C*o1, o2): LN over C only."""
    B = x.shape[0]
    o1 = x.shape[1] // channels
    y4 = x.reshape(B, channels, o1, dim)
    y = _ln_axes(bp["norm"]["1"], y4, (1,), (channels,))
    y = y.reshape(B, channels * o1, dim)
    return _dp(dp, _ff(bp["fn"], y)) + x


def _permuted_block(bp, x, spatial, channels, raft, dp=None):
    """PermutedBlock on (B, co*o1, r*spatial): LN over channels in (c1 c2)
    order (raft_mlp.py:130-146), FF over r*spatial. The LN normalizes the
    (co, r) axes of the 5D view jointly — the weight reshapes to (co, r),
    so the old transpose→flat-LN→transpose round trip disappears."""
    B = x.shape[0]
    co = channels // raft
    o1 = x.shape[1] // co
    y5 = x.reshape(B, co, o1, raft, spatial)
    y = _ln_axes(bp["norm"]["1"], y5, (1, 3), (co, raft))
    y = y.reshape(B, co * o1, raft * spatial)
    return _dp(dp, _ff(bp["fn"], y)) + x


def _channel_block(bp, x, dp=None):
    y = nnf.layer_norm(bp["norm"], x)
    return _dp(dp, _ff(bp["fn"], y)) + x


def _dp(dp, y):
    """Apply DropPath when a (rng, rate, train) triple is threaded."""
    if dp is None:
        return y
    rng, rate, train = dp
    return nnf.drop_path(rng, y, rate, train)


def RaftMLP(
    layers,
    in_channels=3,
    image_size=224,
    num_classes=1000,
    token_expansion_factor=2,
    channel_expansion_factor=4,
    dropout=0.0,
    token_mixing_type="ser_pm",
    shortcut=True,
    gap=False,
    drop_path_rate=0.0,
    seed=0,
):
    assert token_mixing_type in TOKEN_MIXING_TYPES
    n_levels = len(layers)
    last_dim = layers[-1]["dim"]

    # static per-level geometry (raft_mlp.py:149-155, 507)
    geo = []
    img = image_size
    for i, layer in enumerate(layers):
        p = layer["patch_size"]
        geo.append(
            {
                "in": in_channels if i == 0 else layers[i - 1]["dim"],
                "out": layer["dim"],
                "depth": layer["depth"],
                "patch": p,
                "bhw": img // p,
                "hw": math.ceil(img / p),
                "raft": layer.get("raft_size"),
                "img": img,
            }
        )
        img = math.ceil(img / p)
    final_hw = img

    def level_forward(lp, x, g, train=False, rng=None, ctr=None):
        """x: (B, C_in, H, W) NCHW (levels keep the reference layout).
        ``ctr`` is a mutable call counter for per-Block drop-path rngs."""

        def dp():
            if rng is None or not train or drop_path_rate == 0.0:
                return None
            ctr[0] += 1
            return (jax.random.fold_in(rng, ctr[0]), drop_path_rate, train)
        h = w = g["hw"]
        p = g["patch"]
        if g["bhw"] != g["hw"]:
            x = jax.image.resize(
                x, (x.shape[0], x.shape[1], h * p, w * p), method="bilinear"
            )
        B, C = x.shape[0], x.shape[1]
        # 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
        y = x.reshape(B, C, h, p, w, p).transpose(0, 2, 4, 3, 5, 1)
        y = y.reshape(B, h * w, p * p * C)
        if "embed" in lp:
            y = nnf.linear(lp["embed"], y)
        Co = g["out"]
        r = g["raft"]
        for bp in lp["blocks"]:
            if token_mixing_type == "original_tm":
                t = jnp.swapaxes(y, 1, 2)  # b c (h w)
                t = _token_block(bp["1"], t, dp())
                y = jnp.swapaxes(t, 1, 2)
                y = _channel_block(bp["3"], y, dp())
            elif token_mixing_type in ("sep_ln_codim_tm", "sep_ln_ch_tm"):
                # 'b (h w) c -> b (c w) h'
                t = y.reshape(B, h, w, Co).transpose(0, 3, 2, 1).reshape(B, Co * w, h)
                if token_mixing_type == "sep_ln_codim_tm":
                    t = _token_block(bp["1"], t, dp())
                else:
                    t = _sep_token_block(bp["1"], t, Co, h, dp())
                # 'b (c w) h -> b (c h) w'
                t = t.reshape(B, Co, w, h).transpose(0, 1, 3, 2).reshape(B, Co * h, w)
                if token_mixing_type == "sep_ln_codim_tm":
                    t = _token_block(bp["3"], t, dp())
                else:
                    t = _sep_token_block(bp["3"], t, Co, w, dp())
                # 'b (c h) w -> b (h w) c'
                y = t.reshape(B, Co, h, w).transpose(0, 2, 3, 1).reshape(B, h * w, Co)
                y = _channel_block(bp["5"], y, dp())
            else:  # ser_pm
                co = Co // r
                # 'b (h w) (chw co) -> b (co w) (chw h)'
                t = y.reshape(B, h, w, r, co).transpose(0, 4, 2, 3, 1)
                t = t.reshape(B, co * w, r * h)
                t = _permuted_block(bp["1"], t, h, Co, r, dp())
                # 'b (co w) (chw h) -> b (co h) (chw w)'
                t = t.reshape(B, co, w, r, h).transpose(0, 1, 4, 3, 2)
                t = t.reshape(B, co * h, r * w)
                t = _permuted_block(bp["3"], t, w, Co, r, dp())
                # 'b (co h) (chw w) -> b (h w) (chw co)'
                y = t.reshape(B, co, h, r, w).transpose(0, 2, 4, 3, 1)
                y = y.reshape(B, h * w, r * co)
                y = _channel_block(bp["5"], y, dp())
        # 'b (h w) c -> b c h w'
        return y.reshape(B, h, w, Co).transpose(0, 3, 1, 2)

    def head_forward(hp, x, is_last):
        """x NCHW → heads: LN (+mean) (+Linear) (raft_mlp.py:495-506)."""
        y = jnp.transpose(x, (0, 2, 3, 1))
        y = nnf.layer_norm(hp["1"], y)
        y = jnp.transpose(y, (0, 3, 1, 2))
        if gap or not is_last:
            y = jnp.mean(y, axis=(2, 3))
        if not is_last:
            y = nnf.linear(hp["4"], y)
        return y

    def apply(params, x, train=False, rng=None):
        outputs = []
        ctr = [0]
        for i in range(n_levels):
            x = level_forward(params["levels"][i], x, geo[i], train, rng, ctr)
            if shortcut:
                outputs.append(
                    head_forward(params["heads"][i], x, i == n_levels - 1)
                )
        if not shortcut:
            out = head_forward(params["heads"][0], x, True)
        else:
            out = outputs[-1]
            D = last_dim
            for b in outputs[-2::-1]:
                if gap:
                    out = b[:, :D] * out + b[:, D:]
                else:
                    out = (
                        b[:, :D].reshape(-1, D, 1, 1) * out
                        + b[:, D:].reshape(-1, D, 1, 1)
                    )
        if not gap:
            out = out.reshape(out.shape[0], -1)
        return nnf.linear(params["classifier"], out)

    def _structure(nested):
        levels = []
        for i, g in enumerate(geo):
            fn = nested["levels"][str(i)]["fn"]
            entry = {}
            if "1" in fn:
                entry["embed"] = fn["1"]
            entry["blocks"] = [fn[str(2 + j)] for j in range(g["depth"])]
            levels.append(entry)
        heads = [nested["heads"][str(k)] for k in sorted(nested["heads"], key=int)]
        return {
            "levels": levels,
            "heads": heads,
            "classifier": nested["classifier"],
        }

    b = SDBuilder(seed)
    for i, g in enumerate(geo):
        pre = f"levels.{i}.fn"
        has_embed = (
            True
            if token_mixing_type == "original_tm"
            else (g["patch"] != 1 or (g["patch"] == 1 and g["in"] == g["out"]))
        )
        if has_embed:
            b.linear(f"{pre}.1", g["patch"] ** 2 * g["in"], g["out"])
        h = w = g["hw"]
        Co = g["out"]
        for j in range(g["depth"]):
            bp = f"{pre}.{2 + j}"
            if token_mixing_type == "original_tm":
                b.layer_norm(f"{bp}.1.norm.1", Co)
                b.linear(f"{bp}.1.fn.0", h * w, h * w * token_expansion_factor)
                b.linear(f"{bp}.1.fn.3", h * w * token_expansion_factor, h * w)
                b.layer_norm(f"{bp}.3.norm", Co)
                b.linear(f"{bp}.3.fn.0", Co, Co * channel_expansion_factor)
                b.linear(f"{bp}.3.fn.3", Co * channel_expansion_factor, Co)
            elif token_mixing_type == "sep_ln_codim_tm":
                b.layer_norm(f"{bp}.1.norm.1", Co * w)
                b.linear(f"{bp}.1.fn.0", h, h * token_expansion_factor)
                b.linear(f"{bp}.1.fn.3", h * token_expansion_factor, h)
                b.layer_norm(f"{bp}.3.norm.1", Co * h)
                b.linear(f"{bp}.3.fn.0", w, w * token_expansion_factor)
                b.linear(f"{bp}.3.fn.3", w * token_expansion_factor, w)
                b.layer_norm(f"{bp}.5.norm", Co)
                b.linear(f"{bp}.5.fn.0", Co, Co * channel_expansion_factor)
                b.linear(f"{bp}.5.fn.3", Co * channel_expansion_factor, Co)
            elif token_mixing_type == "sep_ln_ch_tm":
                b.layer_norm(f"{bp}.1.norm.1", Co)
                b.linear(f"{bp}.1.fn.0", h, h * token_expansion_factor)
                b.linear(f"{bp}.1.fn.3", h * token_expansion_factor, h)
                b.layer_norm(f"{bp}.3.norm.1", Co)
                b.linear(f"{bp}.3.fn.0", w, w * token_expansion_factor)
                b.linear(f"{bp}.3.fn.3", w * token_expansion_factor, w)
                b.layer_norm(f"{bp}.5.norm", Co)
                b.linear(f"{bp}.5.fn.0", Co, Co * channel_expansion_factor)
                b.linear(f"{bp}.5.fn.3", Co * channel_expansion_factor, Co)
            else:  # ser_pm
                r = g["raft"]
                b.layer_norm(f"{bp}.1.norm.1", Co)
                b.linear(f"{bp}.1.fn.0", h * r, h * r * token_expansion_factor)
                b.linear(f"{bp}.1.fn.3", h * r * token_expansion_factor, h * r)
                b.layer_norm(f"{bp}.3.norm.1", Co)
                b.linear(f"{bp}.3.fn.0", w * r, w * r * token_expansion_factor)
                b.linear(f"{bp}.3.fn.3", w * r * token_expansion_factor, w * r)
                b.layer_norm(f"{bp}.5.norm", Co)
                b.linear(f"{bp}.5.fn.0", Co, Co * channel_expansion_factor)
                b.linear(f"{bp}.5.fn.3", Co * channel_expansion_factor, Co)
    k = 0
    for i, g in enumerate(geo):
        if shortcut or i == n_levels - 1:
            b.layer_norm(f"heads.{k}.1", g["out"])
            if i != n_levels - 1:
                b.linear(f"heads.{k}.4", g["out"], last_dim * 2)
            k += 1
    b.linear(
        "classifier",
        last_dim if gap else last_dim * final_hw ** 2,
        num_classes,
    )
    params = _structure(pytree.nest(b.sd))
    return Model("raft_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)
