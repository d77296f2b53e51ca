"""Every zoo model must take a mixed-precision training step: bf16
forward/backward under train=True (batch-stat BN paths, droppath rngs, scan
carries), f32 grads. This is the gate that caught RepMLPNet's grouped-BN
upcasting the bf16 scan carry to f32."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from parity_report import build_cases  # noqa: E402

import jittor_mlp_tpu  # noqa: E402  (parity_report inserted repo path)
from jittor_mlp_tpu import config  # noqa: E402
from jittor_mlp_tpu.parallel.train import (  # noqa: E402
    cast_floating,
    cross_entropy_loss,
    merge_params,
    split_params,
)

CASES = build_cases()


@pytest.mark.parametrize(
    "name,factory,kwargs,img", [(c[0], c[3], c[4], c[5]) for c in CASES],
    ids=[c[0] for c in CASES],
)
def test_mixed_precision_train_step(name, factory, kwargs, img):
    model = factory(**kwargs)
    train, aux, treedef, n = split_params(model.params)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3, img, img)),
        jnp.float32,
    )
    labels = jnp.zeros((2,), jnp.int32)

    with config.bf16_mode():

        def loss_fn(train):
            full = merge_params(train, aux, treedef, n)
            full = cast_floating(full, jnp.bfloat16)
            logits = model.apply(
                full, x.astype(jnp.bfloat16), train=True,
                rng=jax.random.PRNGKey(0),
            )
            return cross_entropy_loss(logits, labels)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(train)

    assert np.isfinite(float(loss)), f"{name}: loss {loss}"
    for leaf in jax.tree.leaves(grads):
        assert leaf.dtype == jnp.float32, f"{name}: grad dtype {leaf.dtype}"
    gnorm = float(
        sum(float(jnp.sum(jnp.square(g.astype(jnp.float32))))
            for g in jax.tree.leaves(grads)) ** 0.5
    )
    assert np.isfinite(gnorm) and gnorm > 0, f"{name}: grad norm {gnorm}"
