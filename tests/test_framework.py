"""Framework-level tests: remat, einops compat, sharded training, checkpoint utils."""
import numpy as np

import jittor_mlp_tpu as jm


def test_remat_matches_plain():
    import jax

    m1 = jm.AS_MLP(img_size=16, patch_size=4, embed_dim=8, depths=[2], shift_size=3,
                   num_classes=4)
    m2 = jm.AS_MLP(img_size=16, patch_size=4, embed_dim=8, depths=[2], shift_size=3,
                   num_classes=4, use_checkpoint=True)
    m2.params = m1.params
    x = np.random.default_rng(0).standard_normal((2, 3, 16, 16)).astype("float32")
    np.testing.assert_allclose(np.asarray(m1(x)), np.asarray(m2(x)), rtol=1e-5)

    # gradient flows through the remat path
    def loss(p):
        return m2.apply(p, jax.numpy.asarray(x)).sum()

    g = jax.grad(loss)(m2.params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_einops_compat():
    import jax.numpy as jnp

    from jittor_mlp_tpu.utils.einops_compat import Rearrange, Reduce, rearrange

    x = jnp.arange(24.0).reshape(2, 3, 4)
    assert rearrange(x, "b h w -> b (h w)").shape == (2, 12)
    assert Rearrange("b h w -> b w h")(x).shape == (2, 4, 3)
    assert Reduce("b h w -> b", "mean")(x).shape == (2,)


def test_sharded_train_step_runs():
    import jax
    import jax.numpy as jnp
    import optax

    from jittor_mlp_tpu.parallel import make_mesh
    from jittor_mlp_tpu.parallel.train import (
        batch_sharding,
        init_sharded,
        make_train_step,
    )

    mesh = make_mesh(8, model_parallel=2)
    model = jm.MLPMixerForImageClassification(
        d_model=64, depth=2, patch_size=4, image_size=8, num_classes=16
    )
    opt = optax.sgd(1e-2)
    params, opt_state, _ = init_sharded(model.params, opt, mesh)
    step = make_train_step(model.apply, opt)
    batch = {
        "image": jnp.ones((8, 3, 8, 8), jnp.float32),
        "label": jnp.zeros((8,), jnp.int32),
    }
    bs = batch_sharding(mesh)
    batch = {k: jax.device_put(v, bs[k]) for k, v in batch.items()}
    with mesh:
        params, opt_state, loss1 = step(params, opt_state, batch, jax.random.PRNGKey(0))
        params, opt_state, loss2 = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert float(loss2) < float(loss1)  # sgd on a constant batch must descend


def test_resize_pos_embed():
    from jittor_mlp_tpu.utils.checkpoint import resize_pos_embed

    pe = np.random.randn(1, 17, 8).astype("float32")  # cls + 4x4 grid
    out = resize_pos_embed(pe, 1 + 64, has_cls_token=True)  # -> 8x8 grid
    assert out.shape == (1, 65, 8)
    np.testing.assert_allclose(np.asarray(out[0, 0]), pe[0, 0], rtol=1e-6)


def test_batch_sharded_forward_matches_single_device():
    """SURVEY §4(e): DP-sharded inference must produce the same logits."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jittor_mlp_tpu.parallel import make_mesh

    m = jm.MLPMixerForImageClassification(
        d_model=32, depth=2, patch_size=8, image_size=32, num_classes=10
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 3, 32, 32)), jnp.float32
    )
    single = np.asarray(jax.jit(m.apply)(m.params, x))

    mesh = make_mesh(8, model_parallel=1)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ps = jax.device_put(
        m.params, NamedSharding(mesh, P())
    )
    with mesh:
        sharded = np.asarray(jax.jit(m.apply)(ps, xs))
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=1e-5)


def test_drop_path_training_mode():
    import jax

    m = jm.AS_MLP(img_size=16, patch_size=4, embed_dim=8, depths=[2], shift_size=3,
                  num_classes=4, drop_path_rate=0.5)
    x = np.random.default_rng(0).standard_normal((4, 3, 16, 16)).astype("float32")
    ev = np.asarray(m.eval()(x))

    m.train()
    t1 = np.asarray(m(x, rng=jax.random.PRNGKey(0)))
    t2 = np.asarray(m(x, rng=jax.random.PRNGKey(1)))
    t1b = np.asarray(m(x, rng=jax.random.PRNGKey(0)))
    assert not np.allclose(t1, t2), "different rng must give different outputs"
    np.testing.assert_allclose(t1, t1b, rtol=1e-6)  # deterministic given rng
    # eval path unaffected by the drop_path rate
    m2 = jm.AS_MLP(img_size=16, patch_size=4, embed_dim=8, depths=[2], shift_size=3,
                   num_classes=4, drop_path_rate=0.0)
    m2.params = jax.tree_util.tree_map(lambda a, b: b, m2.params, m.params)
    np.testing.assert_allclose(np.asarray(m2.eval()(x)), ev, rtol=1e-5)


def test_bn_recalibration():
    """After recalibrate_bn on the data distribution, eval-mode outputs track
    train-mode (batch-stat) outputs; running stats move off their init."""
    import jax

    from jittor_mlp_tpu.core.train_utils import recalibrate_bn

    m = jm.ConvMixer(dim=16, depth=3, kernel_size=3, patch_size=4, n_classes=5)
    rng = np.random.default_rng(0)
    # shifted/scaled data so init running stats (0 mean, 1 var) are wrong
    batches = [
        (3.0 + 2.0 * rng.standard_normal((16, 3, 16, 16))).astype("float32")
        for _ in range(8)
    ]
    before = np.asarray(m.params["embedding"]["2"]["running_mean"]).copy()

    recalibrate_bn(m, batches)
    after = np.asarray(m.params["embedding"]["2"]["running_mean"])
    assert not np.allclose(before, after)

    # eval with refreshed stats ≈ train-mode forward on a fresh big batch
    xb = (3.0 + 2.0 * rng.standard_normal((64, 3, 16, 16))).astype("float32")
    ev = np.asarray(m.eval()(xb))
    tr = np.asarray(
        jax.jit(lambda p, x: m.apply(p, x, train=True))(m.params, xb)
    )
    err_after = np.abs(ev - tr).max()
    assert err_after < 0.15, err_after

    # stacked (scanned) BN sites got refreshed too
    blk_rm = np.asarray(m.params["blocks"]["0"]["fn"]["2"]["running_mean"])
    assert blk_rm.shape[0] == 3  # stacked over depth
    assert not np.allclose(blk_rm, 0.0)


def test_sequence_parallel_mixer_block():
    """Token-sharded block (shard_map + psum) == dense block exactly."""
    import jax
    import jax.numpy as jnp

    from jittor_mlp_tpu.parallel import make_mesh
    from jittor_mlp_tpu.parallel.sequence import (
        dense_mixer_block,
        token_parallel_mixer_block,
    )

    mesh = make_mesh(8, model_parallel=4)  # 4-way token sharding on 'model'
    B, N, D, TD, CD = 2, 16, 32, 24, 64
    k = jax.random.PRNGKey(0)

    def rn(*s):
        nonlocal k
        k, s2 = jax.random.split(k)
        return jax.random.normal(s2, s, jnp.float32) * 0.1

    x = rn(B, N, D)
    args = (rn(D), rn(D), rn(TD, N), rn(TD), rn(N, TD), rn(N), rn(D), rn(D),
            rn(CD, D), rn(CD), rn(D, CD), rn(D))
    want = np.asarray(dense_mixer_block(x, *args))
    sp_block = token_parallel_mixer_block(mesh, axis="model")
    with mesh:
        got = np.asarray(jax.jit(sp_block)(x, *args))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_train_step_excludes_aux_and_buffers():
    """make_train_step must not differentiate/update BN buffers or aux leaves
    (HireMLP has int32 _step; AS_MLP has _dpr rates and would get negative
    drop rates; BN running stats must not be weight-decayed)."""
    import jax
    import jax.numpy as jnp
    import optax

    from jittor_mlp_tpu.parallel.train import make_train_step, split_params

    m = jm.HireMLP(patch_size=4, num_classes=5, d_model=[8], h=[2], w=[2],
                   cross_region_step=[1], depth=[2], expansion_factor=2)
    opt = optax.adamw(1e-2)
    train, _, _, _ = split_params(m.params)
    opt_state = opt.init(train)
    step = make_train_step(m.apply, opt)
    batch = {"image": jnp.ones((4, 3, 16, 16)), "label": jnp.zeros(4, jnp.int32)}
    step_before = np.asarray(m.params["stages"][0]["blocks"]["_step"]).copy()
    params, opt_state, loss = step(m.params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # aux leaves untouched (snapshot before: donate_argnums consumes inputs)
    np.testing.assert_array_equal(
        np.asarray(params["stages"][0]["blocks"]["_step"]), step_before
    )

    # BN buffers are never optimizer-updated (no adamw/weight-decay): with
    # the EMA disabled they must come back bit-identical. (With the default
    # bn_momentum=0.1 they update via torch's running-stat EMA instead —
    # tests/test_bn_training.py pins those semantics.)
    m2 = jm.ConvMixer(dim=8, depth=2, kernel_size=3, patch_size=4, n_classes=5)
    train2, _, _, _ = split_params(m2.params)
    opt_state2 = opt.init(train2)
    step2 = make_train_step(m2.apply, opt, bn_momentum=None)
    rv_before = np.asarray(m2.params["embedding"]["2"]["running_var"]).copy()
    p2, _, _ = step2(m2.params, opt_state2, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(p2["embedding"]["2"]["running_var"]), rv_before
    )

    # default (torch-semantics) path: the same step WITH the EMA moves them
    m3 = jm.ConvMixer(dim=8, depth=2, kernel_size=3, patch_size=4, n_classes=5)
    train3, _, _, _ = split_params(m3.params)
    step3 = make_train_step(m3.apply, opt)
    p3, _, _ = step3(m3.params, opt.init(train3), batch, jax.random.PRNGKey(0))
    assert not np.array_equal(
        np.asarray(p3["embedding"]["2"]["running_var"]), rv_before
    )


def test_params_save_load_roundtrip(tmp_path):
    from jittor_mlp_tpu.utils.serialization import load_params, save_params

    m = jm.gMLPForImageClassification(image_size=16, patch_size=8, d_model=16,
                                      d_ffn=32, depth=2, num_classes=4)
    x = np.random.default_rng(0).standard_normal((2, 3, 16, 16)).astype("float32")
    want = np.asarray(m(x))
    p = str(tmp_path / "ckpt.npz")
    save_params(m, p)
    m2 = jm.gMLPForImageClassification(image_size=16, patch_size=8, d_model=16,
                                       d_ffn=32, depth=2, num_classes=4, seed=7)
    load_params(m2, p)
    np.testing.assert_allclose(np.asarray(m2(x)), want, rtol=1e-6)


def test_train_state_checkpoint_resume(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from jittor_mlp_tpu.parallel.train import make_train_step, split_params
    from jittor_mlp_tpu.utils.serialization import (
        restore_train_state,
        save_train_state,
    )

    m = jm.MLPMixerForImageClassification(
        d_model=16, depth=2, patch_size=8, image_size=16, num_classes=4
    )
    opt = optax.adam(1e-2)
    train, _, _, _ = split_params(m.params)
    state = opt.init(train)
    step = make_train_step(m.apply, opt)
    batch = {"image": jnp.ones((4, 3, 16, 16)), "label": jnp.zeros(4, jnp.int32)}
    params = m.params
    for i in range(3):
        params, state, _ = step(params, state, batch, jax.random.PRNGKey(i))

    path = str(tmp_path / "state")
    save_train_state(path, params, state, 3)

    # resume in "another process": fresh model + optimizer as templates
    m2 = jm.MLPMixerForImageClassification(
        d_model=16, depth=2, patch_size=8, image_size=16, num_classes=4, seed=9
    )
    t2, _, _, _ = split_params(m2.params)
    s2 = opt.init(t2)
    p_r, s_r, step_r = restore_train_state(path, m2.params, s2, 0)
    assert int(step_r) == 3
    # continuing from restored state = continuing from original state
    a1, _, l1 = step(params, state, batch, jax.random.PRNGKey(99))
    a2, _, l2 = step(p_r, s_r, batch, jax.random.PRNGKey(99))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_window_partition_roundtrip():
    import jax.numpy as jnp

    from jittor_mlp_tpu.ops.window import window_partition, window_reverse

    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(window_reverse(w, 4, 8, 8)),
                                  np.asarray(x))


def test_dcn_registry():
    from jittor_mlp_tpu.ops.dcn import DCN, HEADS

    assert HEADS.get("DCN") is DCN


def test_preprocess_nhwc_layout_and_flops():
    import jax.numpy as jnp

    from jittor_mlp_tpu.data import make_preprocess

    pipe = make_preprocess(image_size=16, layout="NHWC", dtype=jnp.bfloat16)
    out = pipe(np.zeros((2, 16, 16, 3), np.uint8))
    assert out.shape == (2, 16, 16, 3) and out.dtype == jnp.bfloat16

    m = jm.MLPMixerForImageClassification(
        d_model=32, depth=1, patch_size=8, image_size=16, num_classes=4
    )
    f = m.flops((1, 3, 16, 16))
    assert f > 1e4


def test_pipeline_parallel_mixer_blocks():
    """GPipe-style pipeline over stacked mixer blocks == sequential scan."""
    import jax
    import jax.numpy as jnp

    from jittor_mlp_tpu.core import nnf
    from jittor_mlp_tpu.parallel import make_mesh
    from jittor_mlp_tpu.parallel.pipeline import (
        pipeline_blocks,
        shard_stacked_params,
    )

    mesh = make_mesh(8, model_parallel=4)  # 4 pipeline stages
    m = jm.MLPMixerForImageClassification(
        d_model=32, depth=8, patch_size=8, image_size=16, num_classes=4
    )
    blocks = m.params["blocks"]

    def block(bp, h):
        t, c = bp["0"], bp["1"]
        y = nnf.layer_norm(t["norm"], h)
        y = nnf.conv1d_token(t["fn"]["net"]["0"], y)
        y = nnf.gelu(y)
        y = nnf.conv1d_token(t["fn"]["net"]["3"], y)
        h = h + y
        y = nnf.layer_norm(c["norm"], h)
        y = nnf.gelu(nnf.linear(c["fn"]["net"]["0"], y))
        y = nnf.linear(c["fn"]["net"]["3"], y)
        return h + y

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((6, 2, 4, 32)), jnp.float32
    )  # (M=6 microbatches, mb=2, N=4 tokens, D=32)
    want = np.stack(
        [np.asarray(nnf.scan_blocks(block, blocks, x[i])) for i in range(6)]
    )

    pipe = pipeline_blocks(mesh, block, axis="model")
    sharded = jax.device_put(blocks, shard_stacked_params(blocks, mesh))
    with mesh:
        got = np.asarray(jax.jit(pipe)(sharded, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_remat_mode_zoo_wide():
    """config.remat_mode() checkpoints every scanned block at trace time:
    values and grads must match the plain path exactly."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu import config
    from jittor_mlp_tpu.parallel.train import (
        cross_entropy_loss, merge_params, split_params,
    )

    model = jm.gMLPForImageClassification(
        image_size=16, patch_size=4, d_model=32, d_ffn=64, depth=2,
        num_classes=4, use_pallas=False,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 3, 16, 16)), jnp.float32
    )
    labels = jnp.zeros((4,), jnp.int32)
    train, aux, treedef, n = split_params(model.params)

    def loss(train):
        full = merge_params(train, aux, treedef, n)
        return cross_entropy_loss(model.apply(full, x), labels)

    l0, g0 = jax.value_and_grad(loss)(train)
    with config.remat_mode():
        l1, g1 = jax.jit(jax.value_and_grad(loss))(train)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_group_norm_custom_vjp_matches_autodiff():
    """nnf.group_norm's affine path carries a hand-written VJP (AS-MLP's
    backward was GroupNorm-dominated, docs/PERFORMANCE.md); it must equal
    XLA autodiff of the plain composed form for dx, dweight, dbias."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jittor_mlp_tpu.core import nnf

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 4, 4, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    p = {"weight": jnp.asarray(rng.standard_normal(C), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(C), jnp.float32)}
    co = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    for g in (1, 2, 4):
        def plain(p, x):
            xf = x.reshape(B, H, W, g, C // g)
            mu = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=(1, 2, 4),
                           keepdims=True)
            y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(B, H, W, C)
            return y * p["weight"] + p["bias"]

        # _group_norm_affine directly: group_norm gates the custom VJP to
        # bf16 activations (the mixed-precision train path; jax.jvp paths
        # keep the composed form), but its grads must be exact in any dtype
        g1p, g1x = jax.grad(
            lambda p, x: jnp.sum(nnf._group_norm_affine(p, x, g, 1e-5) * co),
            argnums=(0, 1))(p, x)
        g2p, g2x = jax.grad(
            lambda p, x: jnp.sum(plain(p, x) * co), argnums=(0, 1))(p, x)
        np.testing.assert_allclose(np.asarray(g1x), np.asarray(g2x),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(g1p["weight"]),
                                   np.asarray(g2p["weight"]),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(g1p["bias"]),
                                   np.asarray(g2p["bias"]),
                                   rtol=2e-5, atol=2e-6)


def test_dyna_unrolled_attn_custom_vjp_matches_einsum():
    """The DynaMixer VPU unroll's hand-written VJP (enabled in training as
    of r4) must match autodiff of the einsum contraction for both inputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jittor_mlp_tpu.models.dyna_mlp import _attn_apply_unrolled

    rng = np.random.default_rng(1)
    B, H, s, V, W, d = 2, 3, 2, 4, 4, 5
    attn = jnp.asarray(rng.standard_normal((B, H, s, V, W)), jnp.float32)
    xs = jnp.asarray(rng.standard_normal((B, H, s, W, d)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((B, H, s, V, d)), jnp.float32)

    def ref(a, x):
        return jnp.einsum("bhsvw,bhswd->bhsvd", a, x)

    np.testing.assert_allclose(
        np.asarray(_attn_apply_unrolled(attn, xs)), np.asarray(ref(attn, xs)),
        rtol=1e-5, atol=1e-6)
    g1 = jax.grad(lambda a, x: jnp.sum(_attn_apply_unrolled(a, x) * co),
                  (0, 1))(attn, xs)
    g2 = jax.grad(lambda a, x: jnp.sum(ref(a, x) * co), (0, 1))(attn, xs)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
