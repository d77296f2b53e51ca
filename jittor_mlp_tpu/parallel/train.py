"""Sharded training step (DP over 'data', TP over 'model').

The zoo's models are pure ``apply(params, x)`` functions, so the train step is
a plain value_and_grad + optax update jitted over the mesh. Parameter shardings
come from a size heuristic: wide FF hidden dimensions shard over the 'model'
axis, everything small replicates; the batch shards over 'data'. XLA's SPMD
partitioner then places the matching all-reduces on ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


def cross_entropy_loss(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def _leaf_spec(x, model_size, min_dim=512):
    """Shard the largest trailing axis divisible by the model-parallel degree;
    replicate small tensors. Leading stacked-layer axes stay unsharded."""
    if x.ndim == 0:
        return P()
    best_axis, best = None, min_dim - 1
    for axis in range(x.ndim - 1, 0, -1) if x.ndim > 1 else [0]:
        d = x.shape[axis]
        if d % model_size == 0 and d > best:
            best_axis, best = axis, d
    spec = [None] * x.ndim
    if best_axis is not None and model_size > 1:
        spec[best_axis] = "model"
    return P(*spec)


def shard_params(params, mesh):
    """NamedSharding tree for a params pytree under a ('data','model') mesh."""
    model_size = mesh.shape["model"]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _leaf_spec(x, model_size)), params
    )


def batch_sharding(mesh):
    return {
        "image": NamedSharding(mesh, P("data")),
        "label": NamedSharding(mesh, P("data")),
    }


def make_train_step(apply_fn, optimizer):
    """Build a jitted (params, opt_state, batch, rng) -> (params, opt_state, loss).

    Sharding comes from the inputs' NamedShardings (place params with
    ``init_sharded`` and batches with ``batch_sharding``); XLA's SPMD
    partitioner propagates them and inserts the ICI collectives, so the step
    itself is mesh-agnostic.
    """

    def loss_fn(params, batch, rng):
        logits = apply_fn(params, batch["image"], train=True, rng=rng)
        return cross_entropy_loss(logits, batch["label"])

    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def init_sharded(params, optimizer, mesh):
    """Place params/opt_state on the mesh with TP shardings applied."""
    shardings = shard_params(params, mesh)
    params = jax.device_put(params, shardings)
    opt_state = optimizer.init(params)
    return params, opt_state, shardings
