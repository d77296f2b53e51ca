"""Torch-faithful BatchNorm TRAINING semantics (VERDICT r2 item 4).

The reference's BN models update running statistics every train step with
torch's momentum EMA (e.g. /root/reference/models_pytorch/wave_mlp.py:73-77,
conv_mixer.py:22-32). make_train_step must reproduce that exactly: a model
trained here and evaluated torch-style (running stats) has to agree with a
torch-trained twin, with no separate recalibration pass.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import jittor_mlp_tpu as jm
from jittor_mlp_tpu.core import nnf, train_utils
from jittor_mlp_tpu.parallel.train import make_train_step, split_params


def _bn_toy_model(C=8, classes=4, seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "conv": {"weight": jnp.asarray(
            rng.standard_normal((C, 3, 1, 1)), jnp.float32)},
        "bn": {"weight": jnp.ones((C,)), "bias": jnp.zeros((C,)),
               "running_mean": jnp.zeros((C,)),
               "running_var": jnp.ones((C,))},
        "head": {"weight": jnp.asarray(
            rng.standard_normal((classes, C)) * 0.1, jnp.float32),
            "bias": jnp.zeros((classes,))},
    }

    def apply(p, x, train=False, rng=None):
        x = jnp.transpose(x, (0, 2, 3, 1))
        y = nnf.batch_norm(p["bn"], nnf.conv2d(p["conv"], x), train=train)
        return nnf.linear(p["head"], jnp.mean(y, axis=(1, 2)))

    return params, apply


def test_running_stats_match_torch_batchnorm2d():
    """Three train steps: running_mean/var must equal torch.nn.BatchNorm2d's
    train-mode EMA on the same activations (momentum 0.1, unbiased var)."""
    import torch

    params, apply = _bn_toy_model()
    opt = optax.sgd(0.0)  # freeze weights: isolate the running-stat path
    t0, _, _, _ = split_params(params)
    opt_state = opt.init(t0)
    step = make_train_step(apply, opt)

    tbn = torch.nn.BatchNorm2d(8)
    tbn.train()
    w = torch.tensor(np.asarray(params["conv"]["weight"]))
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        x = rng.standard_normal((4, 3, 6, 6)).astype(np.float32)
        batch = {"image": jnp.asarray(x), "label": jnp.zeros((4,), jnp.int32)}
        params, opt_state, _ = step(params, opt_state, batch, key)
        with torch.no_grad():
            tbn(torch.nn.functional.conv2d(torch.tensor(x), w))

    np.testing.assert_allclose(
        np.asarray(params["bn"]["running_mean"]), tbn.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(params["bn"]["running_var"]), tbn.running_var.numpy(),
        atol=1e-5, rtol=1e-5,
    )


def test_scan_stacked_sites_update_correct_slots():
    """WaveMLP (21 BN sites incl. scan-stacked and per-stage-list ones): every
    site's post-step running stats must equal the EMA of ITS own batch stats
    — exercises the execution-order ↔ tree-order alignment and the nested
    list walk that round 2's tagger missed."""
    model = jm.WaveMLP(model_name="T", image_size=32)
    params = model.params
    opt = optax.sgd(0.0)
    t0, _, _, _ = split_params(params)
    opt_state = opt.init(t0)
    step = make_train_step(model.apply, opt)  # f32: stats comparable

    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    batch = {"image": jnp.asarray(x), "label": jnp.zeros((4,), jnp.int32)}

    # expected: one concrete collection pass on the same batch
    tagged, n_sites = train_utils.tag_bn_sites(params)
    assert n_sites == 21
    stats = train_utils.collect_bn_stats(
        model.apply, tagged, jnp.asarray(x), jax.random.PRNGKey(0)
    )
    assert len(stats) == n_sites
    want = {}
    for sid_arr, mean, var, n in stats:
        sid = int(np.asarray(sid_arr).reshape(-1)[0])
        n = np.asarray(n, np.float32)
        nb = n[..., None] if n.ndim else n
        want[sid] = (0.1 * mean, 0.9 + 0.1 * var * nb / np.maximum(nb - 1, 1))

    new_params, _, _ = step(params, opt_state, batch, jax.random.PRNGKey(0))

    # walk in the same canonical order the tagger numbers sites
    got = []

    def walk(node):
        if isinstance(node, (list, tuple)):
            [walk(v) for v in node]
            return
        if not isinstance(node, dict):
            return
        for k in sorted(node):
            walk(node[k])
        if "running_mean" in node:
            got.append((node["running_mean"], node["running_var"]))

    walk(new_params)
    assert len(got) == n_sites
    for sid, (rm, rv) in enumerate(got):
        wm, wv = want[sid]
        np.testing.assert_allclose(np.asarray(rm), wm, atol=1e-5,
                                   err_msg=f"site {sid} mean")
        np.testing.assert_allclose(np.asarray(rv), wv, atol=1e-5, rtol=1e-4,
                                   err_msg=f"site {sid} var")


def test_bn_ema_runs_under_remat_and_mixed_precision():
    from jittor_mlp_tpu import config

    model = jm.ConvMixer(dim=32, depth=2, kernel_size=3, patch_size=4,
                         n_classes=8)
    params = model.params
    opt = optax.adamw(1e-3)
    t0, _, _, _ = split_params(params)
    opt_state = opt.init(t0)
    step = make_train_step(model.apply, opt, compute_dtype=jnp.bfloat16)
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(3).standard_normal((4, 3, 32, 32)),
            jnp.float32,
        ),
        "label": jnp.zeros((4,), jnp.int32),
    }
    with config.remat_mode():
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    moved = [
        leaf for path, leaf in
        jax.tree_util.tree_flatten_with_path(params)[0]
        if "running_mean" in str(path[-1])
        and np.abs(np.asarray(leaf)).max() > 1e-8
    ]
    assert moved, "running stats did not update under remat+bf16"


def test_bn_momentum_none_disables_updates():
    params, apply = _bn_toy_model()
    opt = optax.sgd(0.1)
    t0, _, _, _ = split_params(params)
    step = make_train_step(apply, opt, bn_momentum=None)
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(4).standard_normal((4, 3, 6, 6)),
            jnp.float32,
        ),
        "label": jnp.zeros((4,), jnp.int32),
    }
    new_params, _, _ = step(params, opt.init(t0), batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(new_params["bn"]["running_mean"]), np.zeros(8)
    )
