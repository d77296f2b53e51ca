"""Training-recipe tests: label smoothing vs torch, mixup/cutmix invariants,
schedules, EMA, and the extended sharded train step on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn.functional as F

import jittor_mlp_tpu as jm
from jittor_mlp_tpu.train_recipes import (
    Recipe,
    RecipeState,
    ema_update,
    init_recipe_state,
    make_lr_schedule,
    make_recipe_train_step,
    mixup_cutmix,
    smooth_labels,
    soft_cross_entropy,
    swap_in_ema,
)


def test_label_smoothing_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((16, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 16)
    want = F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), label_smoothing=0.1
    ).item()
    got = float(
        soft_cross_entropy(
            jnp.asarray(logits), smooth_labels(jnp.asarray(labels), 10, 0.1)
        )
    )
    assert abs(got - want) < 1e-6, (got, want)


def test_mixup_only_blends_images_and_labels():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((8, 3, 16, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, 8))
    soft = smooth_labels(labels, 5, 0.0)
    mi, ml = mixup_cutmix(
        jax.random.PRNGKey(3), imgs, soft, mixup_alpha=0.8, cutmix_alpha=0.0
    )
    # label rows remain distributions
    np.testing.assert_allclose(np.asarray(ml.sum(-1)), 1.0, rtol=1e-5)
    # recover lam from a sample whose label differs from its partner's
    lam = None
    for i in range(8):
        if labels[i] != labels[7 - i]:
            lam = float(ml[i, labels[i]])
            break
    assert lam is not None and 0.0 <= lam <= 1.0
    want = lam * np.asarray(imgs) + (1 - lam) * np.asarray(imgs[::-1])
    np.testing.assert_allclose(np.asarray(mi), want, atol=1e-5)


def test_cutmix_only_box_area_matches_lambda():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.standard_normal((4, 3, 32, 32)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3])
    soft = smooth_labels(labels, 4, 0.0)
    mi, ml = mixup_cutmix(
        jax.random.PRNGKey(5), imgs, soft, mixup_alpha=0.0, cutmix_alpha=1.0
    )
    # pixels outside the box are untouched; fraction replaced == 1 - lam
    replaced = np.mean(np.asarray(mi[0]) != np.asarray(imgs[0]))
    lam = float(ml[0, 0])
    assert abs(replaced - (1.0 - lam)) < 0.02, (replaced, lam)


def test_disabled_mixing_is_identity():
    imgs = jnp.ones((2, 3, 8, 8))
    soft = smooth_labels(jnp.asarray([0, 1]), 2, 0.0)
    mi, ml = mixup_cutmix(
        jax.random.PRNGKey(0), imgs, soft, mixup_alpha=0.0, cutmix_alpha=0.0
    )
    assert mi is imgs and ml is soft


def test_lr_schedule_warmup_cosine():
    s = make_lr_schedule(1e-3, total_steps=100, warmup_steps=10, min_lr=1e-5)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1e-3) < 1e-9
    assert float(s(5)) < 1e-3
    assert abs(float(s(100)) - 1e-5) < 1e-7
    # monotone decay after warmup
    vals = [float(s(t)) for t in range(10, 101, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_ema_update_math():
    ema = {"w": jnp.zeros(3)}
    new = {"w": jnp.ones(3)}
    out = ema_update(ema, new, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


def test_recipe_train_step_descends_and_ema_tracks():
    from jittor_mlp_tpu.parallel import make_mesh
    from jittor_mlp_tpu.parallel.train import batch_sharding

    model = jm.MLPMixerForImageClassification(
        image_size=16, patch_size=4, d_model=32, depth=2, num_classes=4,
        use_pallas=False,
    )
    mesh = make_mesh(len(jax.devices()), model_parallel=2)
    recipe = Recipe(mixup_alpha=0.2, cutmix_alpha=0.2, label_smoothing=0.1,
                    ema_decay=0.9)
    optimizer = optax.adamw(make_lr_schedule(3e-3, total_steps=30,
                                             warmup_steps=3))
    state = init_recipe_state(model.params, optimizer, mesh, recipe)
    step = make_recipe_train_step(model.apply, optimizer, 4, recipe)

    rng_np = np.random.default_rng(0)
    protos = rng_np.standard_normal((4, 3, 16, 16)).astype(np.float32)
    bsh = batch_sharding(mesh)

    def batch(i):
        rs = np.random.default_rng(i)
        lab = rs.integers(0, 4, 16)
        img = protos[lab] + 0.2 * rs.standard_normal((16, 3, 16, 16)).astype(
            np.float32
        )
        return {
            "image": jax.device_put(jnp.asarray(img), bsh["image"]),
            "label": jax.device_put(jnp.asarray(lab), bsh["label"]),
        }

    rng = jax.random.PRNGKey(0)
    losses = []
    with mesh:
        for i in range(30):
            state, metrics = step(state, batch(i), rng)
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
            assert 0.0 <= float(metrics["accuracy"]) <= 1.0
            assert np.isfinite(float(metrics["grad_norm"]))
    assert int(state.step) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses

    # EMA params differ from live params but still drive a working forward
    ema_params = swap_in_ema(state.params, state.ema)
    x = jnp.asarray(protos[:2])
    out = model.apply(ema_params, x)
    assert out.shape == (2, 4) and bool(jnp.all(jnp.isfinite(out)))
    live = model.apply(state.params, x)
    assert not np.allclose(np.asarray(out), np.asarray(live))


def test_mixed_precision_step_keeps_f32_masters():
    """compute_dtype=bf16: forward/backward runs bf16, master weights, grads
    and optimizer state stay f32, and a few steps still descend."""
    from jittor_mlp_tpu.parallel import make_mesh
    from jittor_mlp_tpu.parallel.train import batch_sharding, split_params

    model = jm.MLPMixerForImageClassification(
        image_size=16, patch_size=4, d_model=32, depth=2, num_classes=4,
        use_pallas=False,
    )
    mesh = make_mesh(len(jax.devices()), model_parallel=2)
    recipe = Recipe(mixup_alpha=0.0, cutmix_alpha=0.0, label_smoothing=0.0,
                    ema_decay=0.0)
    optimizer = optax.adamw(3e-3)
    state = init_recipe_state(model.params, optimizer, mesh, recipe)
    step = make_recipe_train_step(model.apply, optimizer, 4, recipe,
                                  compute_dtype=jnp.bfloat16)

    rng_np = np.random.default_rng(0)
    protos = rng_np.standard_normal((4, 3, 16, 16)).astype(np.float32)
    bsh = batch_sharding(mesh)

    def batch(i):
        rs = np.random.default_rng(i)
        lab = rs.integers(0, 4, 16)
        img = protos[lab] + 0.2 * rs.standard_normal((16, 3, 16, 16)).astype(
            np.float32
        )
        return {
            "image": jax.device_put(jnp.asarray(img), bsh["image"]),
            "label": jax.device_put(jnp.asarray(lab), bsh["label"]),
        }

    rng = jax.random.PRNGKey(0)
    losses = []
    with mesh:
        for i in range(20):
            state, metrics = step(state, batch(i), rng)
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
    train, _, _, _ = split_params(state.params)
    for leaf in jax.tree.leaves(train):
        assert leaf.dtype == jnp.float32, leaf.dtype
    for leaf in jax.tree.leaves(state.opt_state):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            assert jnp.asarray(leaf).dtype == jnp.float32
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_core_train_step_mixed_precision():
    from jittor_mlp_tpu.parallel import make_mesh
    from jittor_mlp_tpu.parallel.train import (
        batch_sharding, init_sharded, make_train_step,
    )

    model = jm.MLPMixerForImageClassification(
        image_size=8, patch_size=4, d_model=32, depth=2, num_classes=4,
        use_pallas=False,
    )
    mesh = make_mesh(len(jax.devices()), model_parallel=2)
    optimizer = optax.adamw(1e-3)
    params, opt_state, _ = init_sharded(model.params, optimizer, mesh)
    step = make_train_step(model.apply, optimizer,
                           compute_dtype=jnp.bfloat16)
    bsh = batch_sharding(mesh)
    batch = {
        "image": jax.device_put(jnp.ones((8, 3, 8, 8), jnp.float32),
                                bsh["image"]),
        "label": jax.device_put(jnp.zeros((8,), jnp.int32), bsh["label"]),
    }
    with mesh:
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(params):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            assert jnp.asarray(leaf).dtype == jnp.float32
