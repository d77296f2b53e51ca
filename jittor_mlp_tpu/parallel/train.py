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


def _is_trainable(path, leaf):
    """Trainable = float leaf that is not a buffer or importer-planted aux
    (running BN stats; '_'-prefixed leaves like _dpr drop-path rates, _step
    roll steps, _bn_id tags)."""
    if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
        return False
    last = path[-1]
    name = getattr(last, "key", None) or getattr(last, "name", None) or str(last)
    return not (name.startswith("_") or name in ("running_mean", "running_var"))


def split_params(params):
    """Partition a params tree into (trainable, aux, treedef, n_leaves);
    both parts are {leaf_index: array} dicts (valid pytrees)."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    train, aux = {}, {}
    for i, (path, leaf) in enumerate(paths_leaves):
        (train if _is_trainable(path, leaf) else aux)[i] = leaf
    return train, aux, treedef, len(paths_leaves)


def merge_params(train, aux, treedef, n):
    leaves = [train[i] if i in train else aux[i] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


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


def shard_params(params, mesh, min_dim=512):
    """NamedSharding tree for a params pytree under a ('data','model') mesh.

    ``min_dim`` is the smallest axis worth sharding over 'model' (default 512:
    below that the per-shard matmul tiles underfill the MXU and the all-reduce
    dominates). Tests drop it to force real TP on tiny configs."""
    model_size = mesh.shape["model"]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _leaf_spec(x, model_size, min_dim)),
        params,
    )


def batch_sharding(mesh):
    return {
        "image": NamedSharding(mesh, P("data")),
        "label": NamedSharding(mesh, P("data")),
    }


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype`` (ints/bools pass)."""
    return jax.tree.map(
        lambda v: v.astype(dtype)
        if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating) else v,
        tree,
    )


def make_train_step(apply_fn, optimizer, compute_dtype=None, bn_momentum=0.1):
    """Build a (params, opt_state, batch, rng) -> (params, opt_state, loss).

    Sharding comes from the inputs' NamedShardings (place params with
    ``init_sharded`` and batches with ``batch_sharding``); XLA's SPMD
    partitioner propagates them and inserts the ICI collectives, so the step
    itself is mesh-agnostic.

    ``compute_dtype=jnp.bfloat16`` gives standard TPU mixed precision: master
    weights, gradients, and the optimizer stay f32; the forward/backward runs
    in bf16 (params and images cast at the loss boundary, so autodiff emits
    f32 grads through the cast).

    BatchNorm running statistics update every step with torch's train-mode
    EMA semantics (momentum 0.1, unbiased running variance — matching
    torch.nn.BatchNorm2d as used throughout /root/reference/models_pytorch,
    e.g. wave_mlp.py:73-77): the per-batch stats the forward already
    computes flow out of the scan bodies via the nnf sink and fold into the
    (non-trainable) running buffers. ``bn_momentum=None`` disables the
    update (round-1 behavior: refresh via train_utils.recalibrate_bn).
    """
    from ..core import nnf, train_utils

    # exec-order → tree-site alignment is discovered once, concretely, at
    # the first call (ids inside the jitted trace are tracers; see
    # train_utils.execution_order_ids)
    state = {"exec_ids": None}

    def step(params, opt_state, batch, rng):
        from .. import config

        if config.int8_matmul:  # trace-time: jnp.round has a zero gradient,
            # so a backward through the W8A8 path trains nothing, silently
            raise RuntimeError(
                "config.int8_mode() is inference-only: the dynamic-int8 "
                "dense path has zero gradient. Exit the context before "
                "tracing a train step."
            )
        train, aux, treedef, n = split_params(params)
        exec_ids = state["exec_ids"]
        collect = bool(exec_ids)

        def loss_fn(train):
            full = merge_params(train, aux, treedef, n)
            x = batch["image"]
            if compute_dtype is not None:
                full = cast_floating(full, compute_dtype)
                x = x.astype(compute_dtype)
            if collect:
                full, _ = train_utils.tag_bn_sites(full)
                sink = []
                token = nnf._bn_sink
                nnf._bn_sink = sink
                try:
                    logits = apply_fn(full, x, train=True, rng=rng)
                finally:
                    nnf._bn_sink = token
            else:
                sink = []
                logits = apply_fn(full, x, train=True, rng=rng)
            return cross_entropy_loss(logits, batch["label"]), sink

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(train)
        updates, opt_state = optimizer.update(grads, opt_state, train)
        train = optax.apply_updates(train, updates)
        params = merge_params(train, aux, treedef, n)
        if collect and stats:
            params = train_utils.apply_bn_updates(
                params, stats, exec_ids, momentum=bn_momentum
            )
        return params, opt_state, loss

    # jit cache keyed on everything that changes the traced graph — the
    # active block runner above all (same contract as Model._jitted: a step
    # first traced densely must not replay its dense trace inside a
    # pipeline/SP scope, and vice versa). Bounded: oldest entry evicted so
    # per-call runner closures can't pin executables without limit.
    jit_cache = {}

    def jitted():
        from .. import config

        key = (config.compute_dtype, config.matmul_precision, config.remat,
               config.fast_compile, config.pallas_bwd, config.int8_matmul,
               nnf._block_runner)
        fn = jit_cache.get(key)
        if fn is None:
            if len(jit_cache) >= 8:
                jit_cache.pop(next(iter(jit_cache)))
            fn = jax.jit(step, donate_argnums=(0, 1))
        else:  # LRU: keep the hot trace, evict the stalest
            del jit_cache[key]
        jit_cache[key] = fn
        return fn

    def run(params, opt_state, batch, rng):
        if state["exec_ids"] is None:
            state["exec_ids"] = (
                () if bn_momentum is None
                else train_utils.execution_order_ids(
                    apply_fn, params, batch["image"][:1], rng
                )
            )
        if state["exec_ids"] and nnf._block_runner is not None:
            # BN running-stat collection crosses the runner's shard_map
            # boundary (per-stage tracers can't join the outer params), and
            # GPipe's per-microbatch stats would diverge from torch's
            # per-batch EMA anyway — fail fast with the supported recipe
            # instead of an opaque mesh/tracer error at trace time.
            raise RuntimeError(
                "BatchNorm running-stat updates are not supported under a "
                "block runner (pipeline/SP scope). Train with "
                "make_train_step(..., bn_momentum=None) and refresh stats "
                "afterwards with train_utils.recalibrate_bn outside the "
                "scope."
            )
        return jitted()(params, opt_state, batch, rng)

    return run


def init_sharded(params, optimizer, mesh):
    """Place params/opt_state on the mesh with TP shardings applied.

    The optimizer state covers only the trainable partition (buffers and
    aux leaves are excluded from differentiation/updates)."""
    shardings = shard_params(params, mesh)
    params = jax.device_put(params, shardings)
    train, _, _, _ = split_params(params)
    opt_state = optimizer.init(train)
    return params, opt_state, shardings
