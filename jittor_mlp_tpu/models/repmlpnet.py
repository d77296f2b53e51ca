"""RepMLPNet, TPU-native, with locality injection (structural re-param).

Reference semantics: /root/reference/models_pytorch/repmlpnet.py — RepMLPBlock
(ln 57-130): partition the map into h×w tiles (ln 91-94), grouped 1x1-conv FC
over flattened tiles per shareset (partition_affine, ln 96-102) + parallel
conv-BN branches on the tiles (repconv{k}), gated by a GlobalPerceptron SE
(ln 40-55); units are BN-prenorm residual with conv-BN FFN (ln 193-208).

``locality_injection()`` (ln 133-173, 268-271) folds the conv branches and BNs
into the dense FC via the identity-image conv trick — here a pure
params→params transform (``inject_locality``) validated against the commented
equivalence check (ln 285-297).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import nnf, pytree
from ..core.init import SDBuilder
from ..core.model import Model
from ..utils import pair


_conv11 = nnf.conv1x1


def _conv_bn(p, x, stride=1, padding=0, groups=1, train=False, relu=False):
    y = nnf.conv2d(p["conv"], x, stride=stride, padding=padding, groups=groups)
    y = nnf.batch_norm(p["bn"], y, train=train)
    return nnf.relu(y) if relu else y


def _bn_nchw_grouped(p, x, train=False, eps=1e-5):
    """BatchNorm2d over axis 1 of (N, S, h, w): batch stats in train mode
    (reporting to the recalibration sink), running stats at eval."""
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 2, 3))
        var = jnp.var(xf, axis=(0, 2, 3))
        if nnf._bn_sink is not None and "_bn_id" in p:
            n = jnp.float32(x.size // x.shape[1])
            nnf._bn_sink.append((p["_bn_id"], mean, var, n))
    else:
        mean = p["running_mean"].astype(jnp.float32)
        var = p["running_var"].astype(jnp.float32)
    # stats in f32, output in x.dtype (a bf16 x must stay bf16 — the block
    # runs under lax.scan, where an f32-upcast output breaks the carry)
    scale = p["weight"].astype(jnp.float32) / jnp.sqrt(var + eps)
    shift = p["bias"].astype(jnp.float32) - mean * scale
    return (x * scale.astype(x.dtype)[None, :, None, None]
            + shift.astype(x.dtype)[None, :, None, None])


def _conv_bn_tiled(p, xl, rep, k, train, eps=1e-5):
    """repconv{k} + BN on the full C-channel NHWC map (hp == wp == 1 path).

    Depthwise conv with the (S, 1, k, k) shareset kernel tiled rep = C/S
    times; BN statistics are pooled across the rep replicas of each
    shareset so train-mode semantics equal the reference's grouped
    (N·C/S, S, h, w) BatchNorm2d (repmlpnet.py:14-24)."""
    S = p["conv"]["weight"].shape[0]
    C = S * rep
    w_dw = jnp.tile(p["conv"]["weight"], (rep, 1, 1, 1))
    y = nnf.conv2d({"weight": w_dw}, xl, padding=k // 2, groups=C)
    bn = p["bn"]
    if train:
        yf = y.astype(jnp.float32)
        m_c = jnp.mean(yf, axis=(0, 1, 2))
        e2_c = jnp.mean(yf * yf, axis=(0, 1, 2))
        mean = m_c.reshape(rep, S).mean(0)
        var = e2_c.reshape(rep, S).mean(0) - mean * mean
        if nnf._bn_sink is not None and "_bn_id" in bn:
            n = jnp.float32(y.size // S)
            nnf._bn_sink.append((bn["_bn_id"], mean, var, n))
    else:
        mean = bn["running_mean"].astype(jnp.float32)
        var = bn["running_var"].astype(jnp.float32)
    scale = bn["weight"].astype(jnp.float32) / jnp.sqrt(var + eps)
    shift = bn["bias"].astype(jnp.float32) - mean * scale
    return (y * jnp.tile(scale, rep).astype(y.dtype)
            + jnp.tile(shift, rep).astype(y.dtype))


def _repmlp_block(bp, x, C, S, h, w, reparam_conv_k, deploy, train):
    """x: NCHW (matches the reference's partition math 1:1)."""
    N = x.shape[0]
    H, W = x.shape[2], x.shape[3]
    hp, wp = H // h, W // w

    # Global Perceptron (ln 48-55)
    g = jnp.mean(x, axis=(2, 3))[:, None, None, :]  # (N,1,1,C) channel-last
    g = nnf.relu(_conv11(bp["gp"]["fc1"], g))
    g = nnf.sigmoid(_conv11(bp["gp"]["fc2"], g))
    global_vec = g[:, 0, 0, :][:, :, None, None]  # (N, C, 1, 1)

    # partition (ln 91-94)
    parts = x.reshape(N, C, hp, h, wp, w).transpose(0, 2, 4, 1, 3, 5)

    # Channel Perceptron: grouped 1x1 FC over tiles (ln 96-102)
    fc_in = parts.reshape(-1, S, h * w)
    wg = bp["fc3"]["weight"][:, :, 0, 0].reshape(S, h * w, h * w)
    out = jnp.einsum("nsi,sji->nsj", fc_in, wg, precision=nnf._prec())
    if deploy:
        out = out + bp["fc3"]["bias"].reshape(S, h * w)
    out = out.reshape(-1, S, h, w)
    if not deploy:
        out = _bn_nchw_grouped(bp["fc3_bn"], out, train=train)
    fc3_out = out.reshape(-1, hp, wp, S, h, w)

    # Local Perceptron (ln 118-125)
    if reparam_conv_k is not None and not deploy:
        if hp == 1 and wp == 1:
            # Tile == whole map (every driver config: hs == H per stage).
            # The reference's grouped conv runs with only S in-channels
            # (S = 1/4/32/128 over the stages) — 1/128 lane utilization at
            # stage 0. Same math, full lanes: a C-channel depthwise conv on
            # the unpartitioned NHWC map with the shareset kernel tiled
            # C/S× (channel c of the (g·S + s) partition order uses kernel
            # s = c mod S, matching fc_in's reshape(-1, S, h·w) grouping).
            xl = x.transpose(0, 2, 3, 1)  # (N, h, w, C)
            conv_out = 0
            for k in reparam_conv_k:
                conv_out = conv_out + _conv_bn_tiled(
                    bp[f"repconv{k}"], xl, C // S, k, train
                )
            conv_out = conv_out.transpose(0, 3, 1, 2).reshape(
                -1, 1, 1, S, h, w
            )
        else:
            conv_in = parts.reshape(-1, S, h, w).transpose(0, 2, 3, 1)
            conv_out = 0
            for k in reparam_conv_k:
                conv_out = conv_out + _conv_bn(
                    bp[f"repconv{k}"], conv_in, padding=k // 2, groups=S,
                    train=train,
                )
            conv_out = conv_out.transpose(0, 3, 1, 2).reshape(
                -1, hp, wp, S, h, w
            )
        fc3_out = fc3_out + conv_out

    out = fc3_out.transpose(0, 3, 1, 4, 2, 5).reshape(N, C, H, W)
    return out * global_vec


def RepMLPNet(
    in_channels=3,
    num_class=1000,
    patch_size=(4, 4),
    num_blocks=(2, 2, 6, 2),
    channels=(192, 384, 768, 1536),
    hs=(64, 32, 16, 8),
    ws=(64, 32, 16, 8),
    sharesets_nums=(4, 8, 16, 32),
    reparam_conv_k=(3,),
    globalperceptron_reduce=4,
    use_checkpoint=False,
    deploy=False,
    seed=0,
):
    n_stages = len(num_blocks)
    patch_size = pair(patch_size)

    def apply(params, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = _conv_bn(params["conv_embedding"], x, stride=patch_size, train=train, relu=True)
        dep = "deploy" in params
        for i in range(n_stages):
            st = params["stages"][i]
            C, S = channels[i], sharesets_nums[i]

            def block(bp, hcar):
                y = nnf.batch_norm(bp["prebn1"], hcar, train=train)
                y = jnp.transpose(y, (0, 3, 1, 2))
                y = _repmlp_block(
                    bp["repmlp_block"], y, C, S, hs[i], ws[i], reparam_conv_k,
                    dep, train,
                )
                hcar = hcar + jnp.transpose(y, (0, 2, 3, 1))
                y = nnf.batch_norm(bp["prebn2"], hcar, train=train)
                y = _conv_bn(bp["ffn_block"]["ffn_fc1"], y, train=train)
                y = nnf.gelu(y)
                y = _conv_bn(bp["ffn_block"]["ffn_fc2"], y, train=train)
                return hcar + y

            x = nnf.scan_blocks(block, st["blocks"], x, remat=use_checkpoint)
            if i < n_stages - 1:
                x = _conv_bn(params["embeds"][i], x, stride=2, train=train, relu=True)
        x = nnf.batch_norm(params["head_norm"], x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nnf.linear(params["head"], x)

    def _structure(nested):
        stages = []
        for i in range(n_stages):
            st = nested["stages"][str(i)]
            stages.append({"blocks": pytree.stack_numbered(st)})
        out = {
            "conv_embedding": nested["conv_embedding"],
            "stages": stages,
            "embeds": [nested["embeds"][str(i)] for i in range(n_stages - 1)]
            if n_stages > 1
            else [],
            "head_norm": nested["head_norm"],
            "head": nested["head"],
        }
        # deploy checkpoints have fc3.bias and no fc3_bn
        blk0 = nested["stages"]["0"]["0"]["repmlp_block"]
        if "fc3_bn" not in blk0:
            out["deploy"] = jnp.zeros((), jnp.float32)
        return out

    b = SDBuilder(seed)
    b.conv2d("conv_embedding.conv", in_channels, channels[0], patch_size, bias=False)
    b.batch_norm("conv_embedding.bn", channels[0])
    for i in range(n_stages):
        C, S = channels[i], sharesets_nums[i]
        for j in range(num_blocks[i]):
            pre = f"stages.{i}.{j}"
            rb = f"{pre}.repmlp_block"
            b.conv2d(f"{rb}.gp.fc1", C, C // globalperceptron_reduce, 1)
            b.conv2d(f"{rb}.gp.fc2", C // globalperceptron_reduce, C, 1)
            b.conv2d(
                f"{rb}.fc3", S * hs[i] * ws[i], S * hs[i] * ws[i], 1,
                groups=S, bias=deploy,
            )
            if not deploy:
                b.batch_norm(f"{rb}.fc3_bn", S)
                for k in reparam_conv_k or ():
                    b.conv2d(f"{rb}.repconv{k}.conv", S, S, k, groups=S, bias=False)
                    b.batch_norm(f"{rb}.repconv{k}.bn", S)
            b.conv2d(f"{pre}.ffn_block.ffn_fc1.conv", C, C * 4, 1, bias=False)
            b.batch_norm(f"{pre}.ffn_block.ffn_fc1.bn", C * 4)
            b.conv2d(f"{pre}.ffn_block.ffn_fc2.conv", C * 4, C, 1, bias=False)
            b.batch_norm(f"{pre}.ffn_block.ffn_fc2.bn", C)
            b.batch_norm(f"{pre}.prebn1", C)
            b.batch_norm(f"{pre}.prebn2", C)
        if i < n_stages - 1:
            b.conv2d(f"embeds.{i}.conv", C, channels[i + 1], 2, bias=False)
            b.batch_norm(f"embeds.{i}.bn", channels[i + 1])
    b.batch_norm("head_norm", channels[-1])
    b.linear("head", channels[-1], num_class)
    params = _structure(pytree.nest(b.sd))

    model = Model("repmlpnet", apply, params, importer=_structure,
                  init_sd=b.sd)

    def locality_injection():
        model.params = inject_locality(
            model.params, n_stages, num_blocks, channels, sharesets_nums,
            hs, ws, reparam_conv_k,
        )
        model._jit_cache.clear()
        return model

    model.locality_injection = locality_injection
    return model


def _fuse_bn(weight, bn, eps=1e-5):
    """fuse_bn (repmlpnet.py:26-37): returns fused (weight, bias); BN width may
    be a divisor of the conv output width (repeat_interleave broadcast)."""
    std = jnp.sqrt(bn["running_var"] + eps)
    t = bn["weight"] / std
    bias = bn["bias"] - bn["running_mean"] * bn["weight"] / std
    if t.shape[0] != weight.shape[0]:
        rep = weight.shape[0] // t.shape[0]
        t = jnp.repeat(t, rep)
        bias = jnp.repeat(bias, rep)
    return weight * t[:, None, None, None], bias


def _conv_to_fc(kernel, bias, S, h, w):
    """_convert_conv_to_fc (repmlpnet.py:168-173): run the conv over identity
    tile images to materialize the equivalent dense FC.

    dtype-preserving: the identity images take the kernel's dtype so the
    transform never upcasts params (under jax_enable_x64, a default
    jnp.eye would be f64 and poison the fused fc3 — the scan carry then
    fails to typecheck; see tests/test_x64_contract.py)."""
    eye = jnp.eye(h * w, dtype=kernel.dtype)
    I = jnp.tile(eye, (1, S)).reshape(h * w, S, h, w)
    I_nhwc = I.transpose(0, 2, 3, 1)
    out = nnf.conv2d(
        {"weight": kernel}, I_nhwc,
        padding=(kernel.shape[2] // 2, kernel.shape[3] // 2), groups=S,
    )
    fc_k = out.transpose(0, 3, 1, 2).reshape(h * w, S * h * w).T
    fc_b = jnp.repeat(bias, h * w)
    return fc_k, fc_b


def inject_locality(params, n_stages, num_blocks, channels, sharesets_nums,
                    hs, ws, reparam_conv_k):
    """Pure checkpoint transform: fold conv branches + BNs into fc3
    (repmlpnet.py:133-166). Returns deploy-mode params."""
    new_stages = []
    for i in range(n_stages):
        blocks = pytree.unstack_layers(params["stages"][i]["blocks"], num_blocks[i])
        S, h, w = sharesets_nums[i], hs[i], ws[i]
        out_blocks = []
        for bp in blocks:
            rb = dict(bp["repmlp_block"])
            fc_w, fc_b = _fuse_bn(rb["fc3"]["weight"], rb["fc3_bn"])
            if reparam_conv_k is not None:
                ks = sorted(reparam_conv_k)
                largest = ks[-1]
                tk, tb = _fuse_bn(
                    rb[f"repconv{largest}"]["conv"]["weight"],
                    rb[f"repconv{largest}"]["bn"],
                )
                for k in ks[:-1]:
                    kk, kb = _fuse_bn(
                        rb[f"repconv{k}"]["conv"]["weight"], rb[f"repconv{k}"]["bn"]
                    )
                    p = (largest - k) // 2
                    tk = tk + jnp.pad(kk, ((0, 0), (0, 0), (p, p), (p, p)))
                    tb = tb + kb
                rep_w, rep_b = _conv_to_fc(tk, tb, S, h, w)
                fc_w = rep_w.reshape(fc_w.shape) + fc_w
                fc_b = rep_b + fc_b
            nb = dict(bp)
            nrb = {
                "gp": rb["gp"],
                "fc3": {"weight": fc_w, "bias": fc_b},
            }
            nb["repmlp_block"] = nrb
            out_blocks.append(nb)
        new_stages.append({"blocks": pytree.stack_layers(out_blocks)})
    out = dict(params)
    out["stages"] = new_stages
    out["deploy"] = jnp.zeros((), jnp.float32)  # presence flag; pin dtype
    return out


def create_RepMLPNet_B224(deploy=False, **kwargs):
    return RepMLPNet(
        channels=(96, 192, 384, 768), hs=(56, 28, 14, 7), ws=(56, 28, 14, 7),
        num_blocks=(2, 2, 12, 2), reparam_conv_k=(1, 3),
        sharesets_nums=(1, 4, 32, 128), deploy=deploy, **kwargs,
    )


def create_RepMLPNet_B256(deploy=False, **kwargs):
    return RepMLPNet(
        channels=(96, 192, 384, 768), hs=(64, 32, 16, 8), ws=(64, 32, 16, 8),
        num_blocks=(2, 2, 12, 2), reparam_conv_k=(1, 3),
        sharesets_nums=(1, 4, 32, 128), deploy=deploy, **kwargs,
    )
