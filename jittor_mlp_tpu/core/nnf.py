"""Functional NN primitives consuming torch-layout parameter dicts.

Every function takes a param dict ``p`` holding jnp arrays under the same key
names torch uses inside one module (``weight``, ``bias``, ``running_mean``, ...)
and is shape-compatible with the torch layout:

- Linear:   weight (out, in)            — applied as x @ W^T (+ b)
- Conv1d k1: weight (out, in, 1)        — token mixing over axis -2
- Conv2d:   weight (O, I/g, kh, kw)     — NHWC activations, OIHW weights
- Norms:    weight/bias (C,)            — channel-last unless noted

This lets the torch state_dict import be a pure tree reshape (core/pytree.py)
with zero per-layer weight munging. All matmuls take the global precision knob
from ``jittor_mlp_tpu.config`` so parity tests can force 'highest' on TPU.

Reference semantics reproduced from /root/reference/models_pytorch (e.g.
PreNormResidual/FeedForward at mlp_mixer.py:6-27); torch nn.GELU is the exact
erf formulation, so ``approximate=False`` everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .. import config


def _prec():
    return config.matmul_precision


def _dense(x, wt):
    """x @ wt on the dense-op serving path: f32/bf16 MXU matmul normally,
    dynamic W8A8 int8 (2× MXU rate) under config.int8_mode()."""
    if config.int8_matmul:
        from .. import quant

        return quant.dynamic_int8_matmul(x, wt)
    return jnp.matmul(x, wt, precision=_prec())


def gelu(x):
    """torch nn.GELU() / F.gelu default: exact erf variant.

    For bf16 activations (the throughput path) we use the Hendrycks tanh
    form (|error vs exact| < 5e-4, under bf16 resolution): the VPU has
    hardware tanh but no erf, and on-chip micro-bench of a matmul+gelu+matmul
    chain measures erf-poly 2.78 ms vs tanh 2.04 ms vs XLA exact erf 4.14 ms
    per pass — the tanh epilogue fuses into the producing matmul at ~no cost.
    fp32 inputs (parity mode) keep XLA's exact erf."""
    if x.dtype == jnp.bfloat16:
        xf = x.astype(jnp.float32)
        inner = 0.7978845608028654 * (xf + 0.044715 * xf * xf * xf)
        return (0.5 * xf * (1.0 + jnp.tanh(inner))).astype(x.dtype)
    return jax.nn.gelu(x, approximate=False)


def relu(x):
    return jax.nn.relu(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def softmax(x, axis=-1):
    return jax.nn.softmax(x, axis=axis)


# ---------------------------------------------------------------------------
# dense / conv
# ---------------------------------------------------------------------------


def linear(p, x):
    """torch nn.Linear: x[..., in] @ weight(out, in)^T + bias."""
    w = p["weight"]
    y = _dense(x, w.T)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y


def conv1x1(p, x):
    """torch nn.Conv2d(k=1) on channel-last data as a matmul: weight
    (O, I, 1, 1) → x[..., I] @ W^T (+ bias). Honors the precision knob."""
    y = _dense(x, p["weight"][:, :, 0, 0].T)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y


def conv1d_token(p, x):
    """torch nn.Conv1d(N_in, N_out, kernel_size=1) applied over the token axis.

    x: (..., N_in, D); weight: (N_out, N_in, 1). Used as the token mixer in
    MLP-Mixer / gMLP / ResMLP (mlp_mixer.py:34, g_mlp.py:14, res_mlp.py:46).
    On TPU this is a plain matmul on the token axis → MXU.
    """
    w = p["weight"][:, :, 0]  # (N_out, N_in)
    if config.int8_matmul:
        # contraction runs over the token axis: move it last so the dynamic
        # per-token activation scales of _dense cover the contracted slice
        y = _dense(jnp.swapaxes(x, -1, -2), w.T)  # (..., D, N_out)
        y = jnp.swapaxes(y, -1, -2)
    else:
        y = jnp.einsum("oi,...id->...od", w, x, precision=_prec())
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"][..., :, None]
    return y


def _pad_pair(padding):
    if padding == "same":
        return "SAME"  # stride-1 'same' matches torch padding="same"
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    if isinstance(padding, (tuple, list)):
        ph, pw = padding
        if isinstance(ph, int):
            return ((ph, ph), (pw, pw))
        return tuple(padding)
    raise ValueError(f"bad padding {padding!r}")


def conv2d(p, x, stride=1, padding=0, groups=1, dilation=1):
    """torch nn.Conv2d on NHWC activations with OIHW torch weights.

    x: (B, H, W, C_in); weight: (O, I/groups, kh, kw). Depthwise convs are
    ``groups == C_in`` (feature_group_count).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    w = p["weight"]
    if (
        w.shape[2] == w.shape[3] == 1
        and groups == 1
        and stride == (1, 1)
        and padding in (0, (0, 0), "same")
    ):
        # 1×1 conv → plain matmul: the MXU path whose elementwise epilogues
        # (gelu/BN) XLA fuses; convolution HLO is a library call that
        # materializes its output first (measured: pw-conv+gelu+bn 1.50 ms
        # vs fused matmul form 0.43 ms at 64×32×32×768 bf16).
        y = _dense(x, w[:, :, 0, 0].T.astype(x.dtype))
        if "bias" in p and p["bias"] is not None:
            y = y + p["bias"]
        return y
    y = lax.conv_general_dilated(
        x,
        p["weight"].astype(x.dtype),
        window_strides=stride,
        padding=_pad_pair(padding),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=groups,
        precision=_prec(),
    )
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y


def patch_embed(p, x, patch_size):
    """Non-overlapping Conv2d(k=s=patch) as reshape + matmul (MXU-friendly).

    Equivalent to conv2d(p, x, stride=patch, padding=0) when kernel==stride;
    lowering to one big matmul avoids conv overhead for the patchify stem
    (mlp_mixer.py:58-60 et al.). x NHWC → (B, H/p, W/p, C*p*p) @ W.
    """
    ph, pw = (patch_size, patch_size) if isinstance(patch_size, int) else patch_size
    B, H, W, C = x.shape
    x = x.reshape(B, H // ph, ph, W // pw, pw, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H/p, W/p, C, ph, pw
    x = x.reshape(B, H // ph, W // pw, C * ph * pw)
    w = p["weight"].reshape(p["weight"].shape[0], -1)  # (O, C*ph*pw)
    y = _dense(x, w.T.astype(x.dtype))
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y


def max_pool2d(x, kernel, stride, padding):
    """torch nn.MaxPool2d on NHWC."""
    kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------


def layer_norm(p, x, eps=1e-5):
    """torch nn.LayerNorm over the last axis; stats in fp32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = y.astype(x.dtype)
    if p is not None and "weight" in p:
        y = y * p["weight"].astype(x.dtype)
        if "bias" in p and p["bias"] is not None:
            y = y + p["bias"].astype(x.dtype)
    return y


# When set (by train_utils.collect_bn_stats), train-mode batch_norm appends
# (site_id, batch_mean, batch_var) here; scan wrappers turn appends inside
# scan bodies into stacked scan outputs.
_bn_sink = None

# Numerics/tracing hook: models call nnf.probe(tag, x) at stage boundaries;
# a no-op unless utils.probes.capture installed a sink. Tags are static
# strings, so probe sites must sit OUTSIDE lax.scan bodies (stage level).
_probe_sink = None


def probe(tag, x):
    """Record an intermediate under utils.probes.capture; identity otherwise.

    Used by tools/tpu_numerics.py to attribute CPU-vs-TPU fp32 drift to the
    stage that introduces it (VERDICT r2 item 1)."""
    if _probe_sink is not None:
        _probe_sink.append((tag, x))
    return x


def batch_norm(p, x, eps=1e-5, train=False):
    """torch nn.BatchNorm2d/1d in NHWC (channel-last) form.

    Inference uses running stats from the imported state_dict; train mode uses
    per-batch stats over all non-channel axes. Running-stat refresh is a
    separate recalibration pass (train_utils.recalibrate_bn) using _bn_sink.
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        if _bn_sink is not None and "_bn_id" in p:
            # n = per-channel element count, for torch's unbiased n/(n-1)
            # running-var correction (train_utils.apply_bn_updates)
            n = jnp.float32(x.size // x.shape[-1])
            _bn_sink.append((p["_bn_id"], mean, var, n))
    else:
        mean = p["running_mean"].astype(jnp.float32)
        var = p["running_var"].astype(jnp.float32)
    scale = lax.rsqrt(var + eps)
    if "weight" in p and p["weight"] is not None:
        scale = scale * p["weight"].astype(jnp.float32)
    shift = -mean * scale
    if "bias" in p and p["bias"] is not None:
        shift = shift + p["bias"].astype(jnp.float32)
    return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def group_norm(p, x, num_groups, eps=1e-5):
    """torch nn.GroupNorm on NHWC data: stats over (H, W, C/g) per group.

    The affine path carries a hand-written VJP: XLA's autodiff backward of
    the composed mean/var/rsqrt chain materializes several full-size f32
    intermediates, which dominates AS-MLP's backward (GroupNorm bwd was
    11 ms of the 53 ms step, docs/PERFORMANCE.md). The analytic form
    dx = r·(dŷγ − mean(dŷγ) − x̂·mean(dŷγ·x̂)) saves only x̂ (x.dtype) and
    the per-group rsqrt; reductions stay f32 — the same precision class as
    the autodiff backward of the f32-cast forward (grad-parity-tested).

    bf16 activations only (the mixed-precision production train path):
    custom_vjp functions reject forward-mode autodiff, and the f32/f64
    parity paths differentiate through jax.jvp (tests/_grad_parity_impl.py
    directional derivatives), so they keep the composed form."""
    if p is not None and "weight" in p and x.dtype == jnp.bfloat16:
        return _group_norm_affine(p, x, num_groups, eps)
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, num_groups, C // num_groups)
    mu = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2, 4), keepdims=True)
    y = ((xf - mu) * lax.rsqrt(var + eps)).reshape(B, H, W, C).astype(x.dtype)
    if p is not None and "weight" in p:
        y = y * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return y


def _group_norm_fwd_impl(p, x, num_groups, eps):
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, num_groups, C // num_groups)
    mu = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2, 4), keepdims=True)
    r = lax.rsqrt(var + eps)
    xhat = ((xf - mu) * r).reshape(B, H, W, C).astype(x.dtype)
    y = xhat * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return y, xhat, r


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _group_norm_affine(p, x, num_groups, eps):
    y, _, _ = _group_norm_fwd_impl(p, x, num_groups, eps)
    return y


def _group_norm_affine_fwd(p, x, num_groups, eps):
    y, xhat, r = _group_norm_fwd_impl(p, x, num_groups, eps)
    return y, (xhat, r, p)


def _group_norm_affine_bwd(num_groups, eps, res, dy):
    xhat, r, p = res
    w = p["weight"]
    B, H, W, C = dy.shape
    g = num_groups
    dyf = dy.astype(jnp.float32)
    xh = xhat.astype(jnp.float32)
    dw = jnp.sum(dyf * xh, axis=(0, 1, 2))
    db = jnp.sum(dyf, axis=(0, 1, 2))
    dxh = (dyf * w.astype(jnp.float32)).reshape(B, H, W, g, C // g)
    xh5 = xh.reshape(B, H, W, g, C // g)
    m1 = jnp.mean(dxh, axis=(1, 2, 4), keepdims=True)
    m2 = jnp.mean(dxh * xh5, axis=(1, 2, 4), keepdims=True)
    dx = (r * (dxh - m1 - xh5 * m2)).reshape(B, H, W, C).astype(dy.dtype)
    # cotangent must mirror p's full structure (zero for any extra leaves)
    dp = jax.tree.map(jnp.zeros_like, p)
    dp["weight"] = dw.astype(w.dtype)
    dp["bias"] = db.astype(p["bias"].dtype)
    return dp, dx


_group_norm_affine.defvjp(_group_norm_affine_fwd, _group_norm_affine_bwd)


def affine(p, x):
    """ResMLP Aff layer (res_mlp.py:11-19): x * alpha + beta, broadcast on last axis."""
    return x * p["alpha"].reshape(-1) + p["beta"].reshape(-1)


# ---------------------------------------------------------------------------
# regularization (train-mode only; identity in eval)
# ---------------------------------------------------------------------------

# Batch-window context for runners that SPLIT the batch axis inside shard_map
# (pipeline microbatches × 'data' shards): (global_batch, offset) where
# ``offset`` is this shard's traced global sample offset. Without it, every
# shard would draw its per-sample mask at the LOCAL shape with the SAME key —
# threefry's counter-mode then replicates sample-0's bits across all shards
# (batch-correlated stochastic depth, the round-4 PP training defect).
_sample_window = None


class sample_window_scope:
    """Install the (global_batch, sample_offset) window at trace time.

    ``pipeline_blocks`` wraps each stage-compute trace in this scope so
    drop_path draws bits over the GLOBAL batch and slices its local window —
    bit-exact with the dense draw no matter how the batch was split."""

    def __init__(self, global_batch, offset):
        self.value = (int(global_batch), offset)

    def __enter__(self):
        global _sample_window
        self._prev = _sample_window
        _sample_window = self.value
        return self

    def __exit__(self, *exc):
        global _sample_window
        _sample_window = self._prev
        return False


def dropout(rng, x, rate, train):
    if not train or rate == 0.0:
        return x
    if _sample_window is not None:
        # elementwise masks: exact dense parity would need a global-batch-
        # shaped draw per site (wasteful); fold the shard's unique sample
        # offset instead — independent, correctly-distributed draws with no
        # cross-shard mask reuse. drop_path below gets the exact treatment.
        rng = jax.random.fold_in(rng, _sample_window[1])
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(rng, x, rate, train):
    """Stochastic depth per sample (timm DropPath semantics; reference usage
    e.g. /root/reference/models_pytorch/cycle_mlp.py:193-196).

    ``rate`` may be a traced scalar (stacked per-layer rates under lax.scan);
    identity when not training or no rng is threaded. Under a
    ``sample_window_scope`` (batch-splitting runners) the per-sample bits are
    drawn over the GLOBAL batch and sliced at this shard's offset: threefry
    bits are a pure function of (key, flat position), so the masks match the
    dense draw bit-for-bit — dense vs pipelined training parity holds
    (tests/test_pp_zoo.py::test_swin_pair_scan_drop_path_matches_dense).
    """
    if not train or rng is None:
        return x
    keep = jnp.asarray(1.0 - rate, jnp.float32)
    B = x.shape[0]
    if _sample_window is not None:
        gB, off = _sample_window
        full = jax.random.bernoulli(rng, keep, (gB,))
        mask = lax.dynamic_slice(full, (off,), (B,))
        mask = mask.reshape((B,) + (1,) * (x.ndim - 1))
    else:
        mask = jax.random.bernoulli(rng, keep, (B,) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep.astype(x.dtype), jnp.zeros((), x.dtype))


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def global_avg_pool_tokens(x):
    """mean over token axis: (B, N, D) → (B, D)."""
    return jnp.mean(x, axis=-2)


_FULL_UNROLL = False  # set by core.model.Model.flops for exact cost analysis

# Distributed-execution hook: when set (via block_runner_scope or a factory's
# block_runner= kwarg), every homogeneous block stack funnels through the
# runner fn(block_fn, stacked_params, x) instead of the local lax.scan —
# this is how parallel.pipeline (GPipe stages over 'model') and
# parallel.sequence (token sharding) reach EVERY scan-over-blocks family,
# not just the ones that expose an explicit kwarg.
_block_runner = None


class block_runner_scope:
    """Context manager installing a zoo-wide block runner at trace time.

        with nnf.block_runner_scope(pipeline_runner(mesh, microbatches=4)):
            y = model(x)   # every scan_blocks stack runs through the runner

    Stacks with rng-threaded bodies (per-layer drop-path keys) fall back to
    the local scan — their per-layer rng folding has no runner equivalent.
    """

    def __init__(self, runner):
        self.runner = runner

    def __enter__(self):
        global _block_runner
        self._prev = _block_runner
        _block_runner = self.runner
        return self.runner

    def __exit__(self, *exc):
        global _block_runner
        _block_runner = self._prev
        return False


def scan_blocks(block_fn, stacked_params, x, unroll=1, remat=False):
    """Run homogeneous residual blocks under lax.scan.

    ``stacked_params`` is a pytree whose leaves have a leading layer axis
    (built by pytree.stack_layers). One trace of ``block_fn`` regardless of
    depth → fast compiles, and XLA still pipelines the per-layer matmuls.

    ``remat=True`` wraps each block in jax.checkpoint — the equivalent of the
    reference's ``use_checkpoint`` torch.utils.checkpoint flags
    (as_mlp.py:276-277, swin_mlp.py:275-276, ms_mlp.py:179-180,
    repmlpnet.py:252-259): activations recompute in the backward pass.
    ``config.remat_mode()`` turns it on zoo-wide at trace time.
    """
    if _block_runner is not None:
        fn = jax.checkpoint(block_fn) if (remat or config.remat) else block_fn
        return _block_runner(fn, stacked_params, x)

    if _FULL_UNROLL:
        # XLA cost analysis counts a scan body ONCE regardless of trip count;
        # Model.flops() sets this flag so every block materializes in the HLO
        # and the FLOPs number is the real per-forward cost.
        depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
        unroll = int(depth)

    # The sink capture lives INSIDE the (possibly checkpointed) function so
    # collected BN stats are explicit outputs of the remat'd computation —
    # appending remat-trace tracers to an outer list would leak them.
    def inner(bp, h):
        local, token = _enter_local_sink()
        out = block_fn(bp, h)
        _exit_local_sink(token, local)
        return out, tuple(local)

    fn = jax.checkpoint(inner) if (remat or config.remat) else inner

    def body(h, bp):
        return fn(bp, h)

    y, ys = lax.scan(body, x, stacked_params, unroll=unroll)
    _flush_scanned_stats(ys)
    return y


def _enter_local_sink():
    """Redirect _bn_sink to a per-scan-body list so stats become scan ys."""
    global _bn_sink
    if _bn_sink is None:
        return (), None
    local = []
    token = _bn_sink
    _bn_sink = local
    return local, token


def _exit_local_sink(token, local):
    global _bn_sink
    if token is not None:
        _bn_sink = token


def _flush_scanned_stats(ys):
    """Append a scan's stacked per-layer stats (leading L axis) to the sink."""
    if _bn_sink is not None and ys:
        _bn_sink.extend(ys)


def scan_blocks_rng(block_fn, stacked_params, x, rng, unroll=1, remat=False):
    """scan_blocks with a per-layer rng: block_fn(bp, h, rng_layer).

    rng_layer = fold_in(rng, layer_index); passes None when rng is None so
    eval paths trace without random ops.
    """
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if _FULL_UNROLL:
        unroll = int(depth)  # see scan_blocks: exact FLOPs accounting

    do_remat = remat or config.remat
    if _block_runner is not None:
        raw = jax.checkpoint(block_fn) if do_remat else block_fn
        if rng is None:
            # eval-mode stacks: no random ops traced
            return _block_runner(
                lambda bp, h: raw(bp, h, None), stacked_params, x
            )
        # live rng (per-layer drop-path keys): thread the layer index as an
        # extra stacked channel so the runner — which only sees an opaque
        # leading-axis pytree — reproduces the local scan's
        # fold_in(rng, layer_index) exactly. Pipeline stages fold with their
        # GLOBAL layer id AND drop_path slices its global-batch mask window
        # (sample_window_scope, installed by pipeline_blocks), so dense vs
        # pipelined training parity holds per-key and per-sample.
        # This is what lets hierarchical models (as_mlp stages) train under
        # pipeline_runner instead of silently falling back to the local scan.
        idx = jnp.arange(depth)
        return _block_runner(
            lambda xs, h: raw(xs[0], h, jax.random.fold_in(rng, xs[1])),
            (stacked_params, idx), x,
        )

    # sink capture inside the checkpointed fn — see scan_blocks
    def inner(bp, h, r):
        local, token = _enter_local_sink()
        out = block_fn(bp, h, r)
        _exit_local_sink(token, local)
        return out, tuple(local)

    fn = jax.checkpoint(inner) if do_remat else inner

    if rng is None:
        def body(h, bp):
            return fn(bp, h, None)

        y, ys = lax.scan(body, x, stacked_params, unroll=unroll)
        _flush_scanned_stats(ys)
        return y

    idx = jnp.arange(depth)

    def body(h, xs):
        bp, i = xs
        return fn(bp, h, jax.random.fold_in(rng, i))

    y, ys = lax.scan(body, x, (stacked_params, idx), unroll=unroll)
    _flush_scanned_stats(ys)
    return y
