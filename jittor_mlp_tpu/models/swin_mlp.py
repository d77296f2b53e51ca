"""SwinMLP, TPU-native.

Reference semantics: /root/reference/models_pytorch/swin_mlp.py — Swin
hierarchy where window attention is replaced by a grouped-Conv1d multi-head
spatial MLP over window tokens (ln 99-103, 131-139); shifted windows realized
by zero pad (left/top = ws-shift, right/bottom = shift) before partition and a
crop after reverse (ln 95-96, 119-150); Swin PatchMerging between stages
(ln 182-218); LN → global token mean → head (ln 435-452).

The grouped Conv1d becomes a per-head (ws², ws²) matmul via einsum on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..ops.window import window_partition, window_reverse
from ..utils import pair


def _spatial_mlp(p, x, num_heads, ws2):
    """Grouped Conv1d(nH*ws², nH*ws², k=1, groups=nH) on (N, ws², nH, C/nH)
    token-major input: per-head matmul over window positions."""
    w = p["weight"][:, :, 0].reshape(num_heads, ws2, ws2)
    bias = p["bias"].reshape(num_heads, ws2)
    # x: (N, ws2, nH, c) -> (N, nH, ws2, c)
    xh = x.transpose(0, 2, 1, 3)
    y = jnp.einsum("hji,nhic->nhjc", w, xh,
                   precision=nnf._prec()) + bias[None, :, :, None]
    return y.transpose(0, 2, 1, 3)


def _windowed_spatial_mlp(p, y, ws, num_heads):
    """The window partition → grouped matmul → window reverse round trip as
    ONE einsum over the 6D windowed tensor — the window and head axes stay
    where the reshape put them, so the 4 full-tensor relayouts the explicit
    path materializes disappear into the contraction (measured 3-4× faster
    at the 56²/28²/14² stages, tools/swin_probe.py)."""
    B, Hp, Wp, C = y.shape
    ch = C // num_heads
    w5 = p["weight"][:, :, 0].reshape(num_heads, ws, ws, ws, ws)
    b5 = p["bias"].reshape(num_heads, ws, ws).transpose(1, 2, 0)
    y6 = y.reshape(B, Hp // ws, ws, Wp // ws, ws, num_heads, ch)
    out = jnp.einsum("bpiqjhc,hklij->bpkqlhc", y6, w5,
                     precision=nnf._prec())
    out = out + b5[None, None, :, None, :, :, None]
    return out.reshape(B, Hp, Wp, C)


def _swin_block(bp, x, H, W, C, num_heads, window_size, shift_size,
                dpr=0.0, train=False, rng=None):
    import jax as _jax

    from ..core.nnf import drop_path

    r1, r2 = (None, None) if rng is None else _jax.random.split(rng)
    ws = window_size
    B = x.shape[0]
    shortcut = x
    y = nnf.layer_norm(bp["norm1"], x).reshape(B, H, W, C)
    if shift_size > 0:
        pl = pt = ws - shift_size
        pr = pb = shift_size
        y = jnp.pad(y, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    Hp, Wp = y.shape[1], y.shape[2]
    if Hp == ws and Wp == ws:
        # single window: the explicit path is relayout-free and faster
        win = window_partition(y, ws).reshape(
            -1, ws * ws, num_heads, C // num_heads
        )
        win = _spatial_mlp(bp["spatial_mlp"], win, num_heads, ws * ws)
        y = window_reverse(win.reshape(-1, ws, ws, C), ws, Hp, Wp)
    else:
        y = _windowed_spatial_mlp(bp["spatial_mlp"], y, ws, num_heads)
    if shift_size > 0:
        y = y[:, pt : Hp - pb, pl : Wp - pr, :]
    y = y.reshape(B, H * W, C)
    x = shortcut + drop_path(r1, y, dpr, train)
    z = nnf.layer_norm(bp["norm2"], x)
    z = nnf.linear(bp["mlp"]["fc2"], nnf.gelu(nnf.linear(bp["mlp"]["fc1"], z)))
    return x + drop_path(r2, z, dpr, train)


def SwinMLP(
    img_size=224,
    patch_size=4,
    in_chans=3,
    num_classes=1000,
    embed_dim=96,
    depths=[2, 2, 6, 2],
    num_heads=[3, 6, 12, 24],
    window_size=7,
    mlp_ratio=4.0,
    drop_rate=0.0,
    drop_path_rate=0.1,
    ape=False,
    patch_norm=True,
    use_checkpoint=False,
    seed=0,
    **kwargs,
):
    img_size = pair(img_size)
    patch_size = pair(patch_size)
    n_layers = len(depths)
    res0 = (img_size[0] // patch_size[0], img_size[1] // patch_size[1])
    num_features = int(embed_dim * 2 ** (n_layers - 1))

    def stage_geom(i):
        dim = int(embed_dim * 2 ** i)
        res = (res0[0] // 2 ** i, res0[1] // 2 ** i)
        ws = window_size
        if min(res) <= ws:
            ws = min(res)
        return dim, res, ws

    import numpy as _np

    dpr_all = _np.linspace(0, drop_path_rate, sum(depths), dtype=_np.float32)

    def apply(params, x, train=False, rng=None):
        import jax as _jax

        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nnf.patch_embed(params["patch_embed"]["proj"], x, patch_size)
        B = x.shape[0]
        x = x.reshape(B, res0[0] * res0[1], embed_dim)
        if patch_norm:
            x = nnf.layer_norm(params["patch_embed"]["norm"], x)
        if ape:
            x = x + params["absolute_pos_embed"]
        for i in range(n_layers):
            dim, res, ws = stage_geom(i)
            H, W = res
            lp = params["layers"][i]
            nh = num_heads[i]
            # the reference alternates shift 0 / ws//2 per block
            # (swin_mlp.py:253-256) — a regular pattern, so even-depth
            # stages scan over homogeneous BLOCK PAIRS (shift-0 then
            # shifted) with per-pair stacked params: one trace per stage
            # and pipeline-parallel reach via the scan_blocks runner hook.
            shift_b = ws // 2 if min(res) > window_size else 0
            if nnf._block_runner is not None and depths[i] % 2 == 0:
                # distributed execution (GPipe PP): the reference alternates
                # shift 0 / ws//2 per block (swin_mlp.py:253-256) — a regular
                # pattern, so even-depth stages scan over homogeneous BLOCK
                # PAIRS. The stacked layout is built at trace time from the
                # stored per-block list: storage stays per-block (slicing a
                # stored stack measured -7% fwd locally), and the one-time
                # stack cost rides the runner's dispatch.
                off = sum(depths[:i])
                gids = jnp.arange(off, off + depths[i])
                stacked = {
                    "a": pytree.stack_layers(lp["blocks"][0::2]),
                    "b": pytree.stack_layers(lp["blocks"][1::2]),
                    "_dpr_a": jnp.asarray(dpr_all[off : off + depths[i]][0::2]),
                    "_dpr_b": jnp.asarray(dpr_all[off : off + depths[i]][1::2]),
                    "_gid_a": gids[0::2],
                    "_gid_b": gids[1::2],
                }

                def pair(bp, h, r):
                    # drop-path keys fold the GLOBAL block id (stacked as a
                    # data channel), exactly like the dense loop below —
                    # keys stay unique across stages (a per-stage pair index
                    # would collide: stage-0 pair 0 and stage-1 pair 0) and
                    # dense vs pair-scan training draws identical masks. r
                    # is only the is-training flag here.
                    ra = rb = None
                    if r is not None:
                        ra = _jax.random.fold_in(rng, bp["_gid_a"])
                        rb = _jax.random.fold_in(rng, bp["_gid_b"])
                    h = _swin_block(bp["a"], h, H, W, dim, nh, ws, 0,
                                    bp["_dpr_a"], train, ra)
                    return _swin_block(bp["b"], h, H, W, dim, nh, ws,
                                       shift_b, bp["_dpr_b"], train, rb)

                x = nnf.scan_blocks_rng(
                    pair, stacked, x, rng if train else None,
                    remat=use_checkpoint,
                )
            else:
                for j, bp in enumerate(lp["blocks"]):
                    shift = 0 if j % 2 == 0 else shift_b
                    gidx = sum(depths[:i]) + j
                    r = (None if (rng is None or not train)
                         else _jax.random.fold_in(rng, gidx))
                    blk = _swin_block
                    if use_checkpoint:
                        blk = _jax.checkpoint(
                            _swin_block,
                            static_argnums=(2, 3, 4, 5, 6, 7, 8, 9),
                        )
                    x = blk(bp, x, H, W, dim, nh, ws, shift,
                            float(dpr_all[gidx]), train, r)
            if "downsample" in lp:
                x = x.reshape(B, H, W, dim)
                x0 = x[:, 0::2, 0::2]
                x1 = x[:, 1::2, 0::2]
                x2 = x[:, 0::2, 1::2]
                x3 = x[:, 1::2, 1::2]
                x = jnp.concatenate([x0, x1, x2, x3], -1).reshape(
                    B, (H // 2) * (W // 2), 4 * dim
                )
                x = nnf.layer_norm(lp["downsample"]["norm"], x)
                x = nnf.linear(lp["downsample"]["reduction"], x)
        x = nnf.layer_norm(params["norm"], x)
        x = jnp.mean(x, axis=1)
        return nnf.linear(params["head"], x)

    def _structure(nested):
        layers = []
        for i in range(n_layers):
            st = nested["layers"][str(i)]
            entry = {
                "blocks": [st["blocks"][str(j)] for j in range(depths[i])]
            }
            if "downsample" in st:
                entry["downsample"] = st["downsample"]
            layers.append(entry)
        out = {
            "patch_embed": nested["patch_embed"],
            "layers": layers,
            "norm": nested["norm"],
            "head": nested["head"],
        }
        if ape:
            out["absolute_pos_embed"] = nested["absolute_pos_embed"]
        return out

    b = SDBuilder(seed)
    b.conv2d("patch_embed.proj", in_chans, embed_dim, patch_size)
    if patch_norm:
        b.layer_norm("patch_embed.norm", embed_dim)
    if ape:
        b.trunc_normal_(
            "absolute_pos_embed", (1, res0[0] * res0[1], embed_dim), std=0.02
        )
    for i in range(n_layers):
        dim, res, ws = stage_geom(i)
        for j in range(depths[i]):
            pre = f"layers.{i}.blocks.{j}"
            b.layer_norm(f"{pre}.norm1", dim)
            b.conv1d(
                f"{pre}.spatial_mlp",
                ws * ws,
                num_heads[i] * ws * ws,
            )
            # grouped conv weight: (nH*ws², ws², 1)
            b.layer_norm(f"{pre}.norm2", dim)
            b.linear(f"{pre}.mlp.fc1", dim, int(dim * mlp_ratio))
            b.linear(f"{pre}.mlp.fc2", int(dim * mlp_ratio), dim)
        if i < n_layers - 1:
            b.layer_norm(f"layers.{i}.downsample.norm", 4 * dim)
            b.linear(f"layers.{i}.downsample.reduction", 4 * dim, 2 * dim, bias=False)
    b.layer_norm("norm", num_features)
    b.linear("head", num_features, num_classes)
    params = _structure(pytree.nest(b.sd))
    return Model("swin_mlp", apply, params, importer=_structure,
                 init_sd=b.sd)
