"""Fused Pallas mixer-block kernel: interpret-mode equivalence on CPU."""
import functools

import numpy as np


def test_fused_mixer_block_matches_plain():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.mixer_block as mb

    B, N, D, TD, CD = 8, 20, 32, 24, 64
    k = jax.random.PRNGKey(0)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return jax.random.normal(s2, s, jnp.float32) * 0.1

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(TD, N), rn(TD), rn(N, TD), rn(N), rn(D), rn(D),
            rn(CD, D), rn(CD), rn(D, CD), rn(D))

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = np.asarray(mb.fused_mixer_block(x, *args, bt=2))
    finally:
        pl.pallas_call = orig

    ln1w, ln1b, wt1, bt1, wt2, bt2, ln2w, ln2b, wc1, bc1, wc2, bc2 = args

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return ((x - mu) * lax.rsqrt(var + 1e-5)) * w + b

    y = jnp.einsum("oi,bid->bod", wt1, ln(x, ln1w, ln1b)) + bt1[None, :, None]
    y = jnp.einsum("oi,bid->bod", wt2, jax.nn.gelu(y, approximate=False)) + bt2[None, :, None]
    h = x + y
    y2 = jax.nn.gelu(ln(h, ln2w, ln2b) @ wc1.T + bc1, approximate=False) @ wc2.T + bc2
    want = np.asarray(h + y2)
    assert np.abs(got - want).max() < 1e-5


def test_axial_shift_pallas_matches_xla_and_vjp():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.shift_kernel as sk
    from jittor_mlp_tpu.ops.shift import axial_shift

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 6, 7, 10)), jnp.float32
    )
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        for axis in (1, 2):
            got = np.asarray(sk.axial_shift_pallas(x, 3, axis))
            want = np.asarray(axial_shift(x, 3, axis))
            np.testing.assert_allclose(got, want, rtol=1e-6)

        # custom VJP equals autodiff of the XLA lowering
        g_pallas = jax.grad(lambda v: (sk.axial_shift_pallas(v, 3, 1) ** 2).sum())(x)
        g_xla = jax.grad(lambda v: (axial_shift(v, 3, 1) ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-6)
    finally:
        pl.pallas_call = orig


def test_fused_block_trainable_grads_match_plain():
    """Custom-VJP fused block: forward = Pallas kernel (interpret here),
    backward = VJP of the identical jnp math."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.mixer_block as mb

    B, N, D, TD, CD = 4, 20, 32, 24, 64
    k = jax.random.PRNGKey(0)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return jax.random.normal(s2, s, jnp.float32) * 0.1

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(TD, N), rn(TD), rn(N, TD), rn(N), rn(D), rn(D),
            rn(CD, D), rn(CD), rn(D, CD), rn(D))

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        def loss_fused(x, *w):
            return (mb.fused_mixer_block_trainable(2, x, *w) ** 2).sum()

        def loss_plain(x, *w):
            return (mb._plain_block(x, *w) ** 2).sum()

        lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 3))(x, *args)
        lp, gp = jax.value_and_grad(loss_plain, argnums=(0, 1, 3))(x, *args)
        np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
        for a, b in zip(gf, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                       atol=1e-6)
    finally:
        pl.pallas_call = orig


def test_fused_block_pallas_bwd_grads_match_plain():
    """Fully-fused trainable block (mixer_block_bwd): Pallas forward AND
    Pallas backward (token bwd + channel data bwd + channel weight bwd
    kernels, interpret here) must match jax.grad of the identical jnp math
    for EVERY argument — x, both LN pairs, all four matmul weights, all
    four biases."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.mixer_block as mb
    import jittor_mlp_tpu.ops.pallas.mixer_block_bwd as mbb

    B, N, D, TD, CD = 4, 20, 32, 24, 64
    k = jax.random.PRNGKey(2)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return jax.random.normal(s2, s, jnp.float32) * 0.1

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(TD, N), rn(TD), rn(N, TD), rn(N), rn(D), rn(D),
            rn(CD, D), rn(CD), rn(D, CD), rn(D))
    w = rn(B, N, D)
    all_args = tuple(range(13))

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        def loss_fused(x, *a):
            return jnp.sum(mbb.fused_mixer_block_train(2, x, *a) * w)

        def loss_plain(x, *a):
            return jnp.sum(mb._plain_block(x, *a) * w)

        lf, gf = jax.value_and_grad(loss_fused, argnums=all_args)(x, *args)
        lp, gp = jax.value_and_grad(loss_plain, argnums=all_args)(x, *args)
        np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
        for a, b in zip(gf, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
    finally:
        pl.pallas_call = orig


def test_fused_gmlp_block_matches_plain():
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.gmlp_block as gb

    B, N, D, F = 4, 20, 32, 48
    k = jax.random.PRNGKey(0)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return jax.random.normal(s2, s, jnp.float32) * 0.1

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(2 * F, D), rn(2 * F), rn(F), rn(F), rn(N, N),
            rn(N), rn(D, F), rn(D))
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = np.asarray(gb.fused_gmlp_block(x, *args, bt=2))
    finally:
        pl.pallas_call = orig
    ln1w, ln1b, w1, b1, sw, sb, wsp, bs, w2, b2 = args

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return ((x - mu) * lax.rsqrt(var + 1e-5)) * w + b

    y = jax.nn.gelu(ln(x, ln1w, ln1b) @ w1.T + b1, approximate=False)
    u, v = y[..., :F], y[..., F:]
    v2 = jnp.einsum("oi,bif->bof", wsp, ln(v, sw, sb)) + bs[None, :, None]
    want = np.asarray(x + (u * v2) @ w2.T + b2)
    assert np.abs(got - want).max() < 1e-5


def test_fused_resmlp_block_matches_plain():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.resmlp_block as rb

    B, N, D, F = 4, 20, 32, 64
    k = jax.random.PRNGKey(0)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return jax.random.normal(s2, s, jnp.float32) * 0.1

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(D), rn(N, N), rn(N), rn(D), rn(D), rn(D),
            rn(F, D), rn(F), rn(D, F), rn(D))
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = np.asarray(rb.fused_resmlp_block(x, *args, bt=2))
    finally:
        pl.pallas_call = orig
    a1, b1, g1, wt, btk, a2, b2, g2, w1, c1, w2, c2 = args
    h = x * a1 + b1
    h = h + g1 * (jnp.einsum("oi,bif->bof", wt, h) + btk[None, :, None])
    h = h * a2 + b2
    f = jax.nn.gelu(h @ w1.T + c1, approximate=False) @ w2.T + c2
    want = np.asarray(h + g2 * f)
    assert np.abs(got - want).max() < 1e-5

def test_fused_gmlp_trainable_grads_match_plain():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.gmlp_block as gb

    B, N, D, F = 4, 20, 32, 24
    k = jax.random.PRNGKey(1)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return jax.random.normal(s2, s, jnp.float32) * 0.1

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(2 * F, D), rn(2 * F), rn(F), rn(F),
            rn(N, N), rn(N), rn(D, F), rn(D))

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        def loss_fused(x, *w):
            return (gb.fused_gmlp_block_trainable(2, x, *w) ** 2).sum()

        def loss_plain(x, *w):
            return (gb._plain_gmlp_block(x, *w) ** 2).sum()

        lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 3, 7))(x, *args)
        lp, gp = jax.value_and_grad(loss_plain, argnums=(0, 3, 7))(x, *args)
        np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
        for a, b in zip(gf, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                       atol=1e-6)
    finally:
        pl.pallas_call = orig


def test_fused_resmlp_trainable_grads_match_plain():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.resmlp_block as rb

    B, N, D = 4, 20, 32
    F = 4 * D
    k = jax.random.PRNGKey(2)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return jax.random.normal(s2, s, jnp.float32) * 0.1

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(D), rn(N, N), rn(N), rn(D), rn(D), rn(D),
            rn(F, D), rn(F), rn(D, F), rn(D))

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        def loss_fused(x, *w):
            return (rb.fused_resmlp_block_trainable(2, x, *w) ** 2).sum()

        def loss_plain(x, *w):
            return (rb._plain_resmlp_block(x, *w) ** 2).sum()

        lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 3, 4))(x, *args)
        lp, gp = jax.value_and_grad(loss_plain, argnums=(0, 3, 4))(x, *args)
        np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
        for a, b in zip(gf, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                       atol=1e-6)
    finally:
        pl.pallas_call = orig


def test_fused_block_int8_error_bounded():
    """The W8A8 fused block (mixer_block_int8) must stay in the same error
    class as the XLA dynamic-int8 path: both approximate the f32/bf16 block
    with per-matmul symmetric int8 quantization, so the kernel's deviation
    from the plain block is bounded by a small multiple of the XLA W8A8
    path's own deviation (the kernel's per-(row, chunk) channel scales are
    strictly finer)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.mixer_block as mb
    import jittor_mlp_tpu.ops.pallas.mixer_block_int8 as mi
    from jittor_mlp_tpu.quant import dynamic_int8_matmul as dq

    B, N, D, TD, CD = 4, 20, 32, 24, 64
    k = jax.random.PRNGKey(0)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return (jax.random.normal(s2, s, jnp.float32) * 0.5).astype(
            jnp.bfloat16)

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(TD, N), rn(TD), rn(N, TD), rn(N), rn(D), rn(D),
            rn(CD, D), rn(CD), rn(D, CD), rn(D))
    (ln1w, ln1b, wt1, bt1, wt2, bt2, ln2w, ln2b, wc1, bc1, wc2, bc2) = args
    ref = mb._plain_block(x, *args).astype(jnp.float32)

    # XLA W8A8 equivalent of the same block
    def ln(v, w, b, eps=1e-5):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, -1, keepdims=True)
        var = jnp.mean(jnp.square(vf - mu), -1, keepdims=True)
        return (((vf - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(
            v.dtype)

    xn = ln(x, ln1w, ln1b)
    t = dq(jnp.swapaxes(xn, 1, 2), wt1.T)
    t = mb._gelu_tanh((t + bt1).astype(jnp.float32)).astype(x.dtype)
    h = x + jnp.swapaxes(dq(t, wt2.T), 1, 2) + bt2[None, :, None]
    c = dq(ln(h, ln2w, ln2b), wc1.T) + bc1
    c = mb._gelu_tanh(c.astype(jnp.float32)).astype(x.dtype)
    y_xla = (h + dq(c, wc2.T) + bc2).astype(jnp.float32)
    err_xla = float(jnp.max(jnp.abs(y_xla - ref)))

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        out = mi.fused_mixer_block_int8(x, *args, bt=2).astype(jnp.float32)
    finally:
        pl.pallas_call = orig
    err_kernel = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err_kernel <= max(2.0 * err_xla, 0.05 * scale), (
        err_kernel, err_xla, scale)
    assert err_kernel > 0  # it IS quantized, not silently bf16


def test_fused_resmlp_int8_error_bounded():
    """resmlp_block_int8 must stay in the same error class as the XLA
    dynamic-int8 path applied to the same block math (mixer kernel's bound)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.resmlp_block as rb
    import jittor_mlp_tpu.ops.pallas.resmlp_block_int8 as ri
    from jittor_mlp_tpu.ops.pallas.mixer_block import _gelu_tanh
    from jittor_mlp_tpu.quant import dynamic_int8_matmul as dq

    B, N, D, F = 4, 20, 32, 64
    k = jax.random.PRNGKey(1)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return (jax.random.normal(s2, s, jnp.float32) * 0.5).astype(
            jnp.bfloat16)

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(D), rn(N, N), rn(N), rn(D), rn(D), rn(D),
            rn(F, D), rn(F), rn(D, F), rn(D))
    (a1, b1, g1, wt, btk, a2, b2, g2, w1, c1, w2, c2) = args
    ref = rb._plain_resmlp_block(x, *args).astype(jnp.float32)

    # XLA W8A8 equivalent of the same block
    h = (x.astype(jnp.float32) * a1 + b1).astype(x.dtype)
    t = jnp.swapaxes(dq(jnp.swapaxes(h, 1, 2), wt.T), 1, 2)
    t = t + btk[None, :, None]
    h = (h.astype(jnp.float32) + g1 * t.astype(jnp.float32)) * a2 + b2
    h = h.astype(x.dtype)
    c = _gelu_tanh((dq(h, w1.T) + c1).astype(jnp.float32)).astype(x.dtype)
    y_xla = (h.astype(jnp.float32)
             + g2 * (dq(c, w2.T) + c2).astype(jnp.float32))
    err_xla = float(jnp.max(jnp.abs(y_xla - ref)))

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        out = ri.fused_resmlp_block_int8(x, *args, bt=2).astype(jnp.float32)
    finally:
        pl.pallas_call = orig
    err_kernel = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err_kernel <= max(2.0 * err_xla, 0.05 * scale), (
        err_kernel, err_xla, scale)
    assert err_kernel > 0


def test_fused_gmlp_int8_error_bounded():
    """gmlp_block_int8 must stay in the same error class as the XLA
    dynamic-int8 path applied to the same block math."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import jittor_mlp_tpu.ops.pallas.gmlp_block as gb
    import jittor_mlp_tpu.ops.pallas.gmlp_block_int8 as gi
    from jittor_mlp_tpu.ops.pallas.mixer_block import _gelu_tanh
    from jittor_mlp_tpu.quant import dynamic_int8_matmul as dq

    B, N, D, f = 4, 20, 32, 48
    k = jax.random.PRNGKey(2)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return (jax.random.normal(s2, s, jnp.float32) * 0.5).astype(
            jnp.bfloat16)

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(2 * f, D), rn(2 * f), rn(f), rn(f), rn(N, N),
            rn(N), rn(D, f), rn(D))
    (ln1w, ln1b, w1, b1, sgu_w, sgu_b, wsp, bs, w2, b2) = args
    ref = gb._plain_gmlp_block(x, *args).astype(jnp.float32)

    def ln(v, w, b, eps=1e-5):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, -1, keepdims=True)
        var = jnp.mean(jnp.square(vf - mu), -1, keepdims=True)
        return (((vf - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(
            v.dtype)

    xn = ln(x, ln1w, ln1b)
    y = _gelu_tanh((dq(xn, w1.T) + b1).astype(jnp.float32)).astype(x.dtype)
    u, v = y[..., :f], y[..., f:]
    vn = ln(v, sgu_w, sgu_b)
    v2 = jnp.swapaxes(dq(jnp.swapaxes(vn, 1, 2), wsp.T), 1, 2)
    v2 = v2 + bs[None, :, None]
    g = (u.astype(jnp.float32) * v2.astype(jnp.float32)).astype(x.dtype)
    y_xla = x.astype(jnp.float32) + (dq(g, w2.T) + b2).astype(jnp.float32)
    err_xla = float(jnp.max(jnp.abs(y_xla - ref)))

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        out = gi.fused_gmlp_block_int8(x, *args, bt=2).astype(jnp.float32)
    finally:
        pl.pallas_call = orig
    err_kernel = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err_kernel <= max(2.0 * err_xla, 0.05 * scale), (
        err_kernel, err_xla, scale)
    assert err_kernel > 0
