"""BatchNorm running-stat recalibration for trained models.

The zoo's BN layers normalize with batch statistics in train mode; running
statistics (used at eval) come from imported torch checkpoints. After training
from scratch, refresh them with ``recalibrate_bn(model, batches)`` — the
standard BN re-estimation pass: run N training batches, average the observed
batch statistics per BN site, write them into ``running_mean``/``running_var``
(unbiased variance, matching torch's running-stat convention).

Mechanism: ``tag_bn_sites`` plants an integer ``_bn_id`` leaf in every BN
param dict (for scan-stacked blocks, an (L,)-shaped id per layer). In a
collection pass, nnf.batch_norm appends (id, mean, var) to a sink; nnf's scan
wrappers convert appends inside scan bodies into stacked scan outputs, so ids
and stats come back as concrete jit outputs that map directly onto the tree.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import nnf


def tag_bn_sites(params):
    """Return (tagged_params, n_sites): every dict holding running_mean gains
    a ``_bn_id`` leaf (shape = leading stacked dims of running_mean[..., 0])."""
    counter = [0]

    def walk(node):
        # lists/tuples nested anywhere (e.g. per-stage model lists) must be
        # descended too, or their BN sites silently go untagged. Dict keys
        # walk in SORTED order — the canonical pytree order, so numbering is
        # invariant under flatten/unflatten round-trips (which sort keys).
        if isinstance(node, (list, tuple)):
            t = [walk(v) for v in node]
            return type(node)(t) if not isinstance(node, tuple) else tuple(t)
        if not isinstance(node, dict):
            return node
        out = {k: walk(node[k]) for k in sorted(node)}
        if "running_mean" in node:
            rm = node["running_mean"]
            lead = rm.shape[:-1]  # leading layer axes for scan-stacked sites
            out["_bn_id"] = jnp.full(lead, counter[0], dtype=jnp.int32)
            counter[0] += 1
        return out

    return walk(params), counter[0]


def _strip_tags(params):
    if isinstance(params, dict):
        return {k: _strip_tags(v) for k, v in params.items() if k != "_bn_id"}
    if isinstance(params, (list, tuple)):
        t = [_strip_tags(v) for v in params]
        return type(params)(t) if not isinstance(params, tuple) else tuple(t)
    return params


def make_bn_collector(apply_fn, rng=None):
    """Jitted (tagged_params, x) → [(id, mean, var, n), ...] (compiled once)."""

    @jax.jit
    def run(params, x):
        sink = []
        token = nnf._bn_sink
        nnf._bn_sink = sink
        try:
            apply_fn(params, x, train=True, rng=rng)
        finally:
            nnf._bn_sink = token
        return sink

    return run


def collect_bn_stats(apply_fn, tagged_params, x, rng=None):
    """One train-mode forward returning [(id, mean, var, n), ...] (concrete)."""
    stats = make_bn_collector(apply_fn, rng)(tagged_params, x)
    return jax.tree_util.tree_map(np.asarray, stats)


def execution_order_ids(apply_fn, params, x, rng=None):
    """Static site-id sequence in sink (execution) order, via one concrete
    tagged collection pass. parallel.train.make_train_step uses this once to
    align the traced per-step stats (whose id leaves are tracers) with the
    tree-walk site numbering, so the running-stat EMA can be applied inside
    jit. Returns () when the model has no BN sites."""
    tagged, n_sites = tag_bn_sites(params)
    if n_sites == 0:
        return ()
    # site discovery always probes the DENSE path: a distributed block
    # runner (nnf.block_runner_scope) requires microbatch-divisible batches
    # and would reject this B=1 probe; execution order is runner-invariant
    with nnf.block_runner_scope(None):
        stats = collect_bn_stats(apply_fn, tagged, x, rng)
    return tuple(
        int(np.asarray(sid).reshape(-1)[0]) for sid, _m, _v, _n in stats
    )


def apply_bn_updates(params, stats, exec_ids, momentum=0.1):
    """torch BatchNorm train-mode running-stat update, applied functionally.

    ``stats``: the [(id, mean, var, n), ...] a sink-instrumented train
    forward collected (ids may be tracers — they are ignored; ``exec_ids``
    supplies the static execution-order → site mapping from
    execution_order_ids). Semantics match torch.nn.BatchNorm2d
    (batchnorm.py forward):

        running_mean ← (1 − m)·running_mean + m·batch_mean
        running_var  ← (1 − m)·running_var  + m·batch_var·n/(n−1)

    with m = ``momentum`` (torch default 0.1) and the UNBIASED batch
    variance for the running update (biased is used for normalization).
    Returns a new params tree; jit-safe.
    """
    by_site = {}
    for pos, entry in enumerate(stats):
        _sid, mean, var, n = entry
        by_site[exec_ids[pos]] = (mean, var, n)
    counter = [0]
    m = momentum

    def walk(node):
        if not isinstance(node, dict):
            if isinstance(node, (list, tuple)):
                t = [walk(v) for v in node]
                return type(node)(t) if not isinstance(node, tuple) else tuple(t)
            return node
        # sorted-key walk: must number sites exactly like tag_bn_sites
        out = {k: walk(node[k]) for k in sorted(node)}
        if "running_mean" in node:
            sid = counter[0]
            counter[0] += 1
            if sid in by_site:
                mean, var, n = by_site[sid]
                n = jnp.asarray(n, jnp.float32)
                if n.ndim:  # stacked sites: (L,) counts broadcast over C
                    n = n[..., None]
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                rm, rv = node["running_mean"], node["running_var"]
                out["running_mean"] = (
                    (1.0 - m) * rm.astype(jnp.float32) + m * mean
                ).astype(rm.dtype)
                out["running_var"] = (
                    (1.0 - m) * rv.astype(jnp.float32) + m * unbiased
                ).astype(rv.dtype)
        return out

    return walk(params)


def recalibrate_bn(model, batches, rng=None):
    """Refresh running_mean/running_var of ``model`` from training batches.

    batches: iterable of NCHW arrays. Averages per-site batch statistics (the
    biased batch variance — for the usual n = B·H·W the unbiased correction
    torch applies to running updates is negligible). Mutates model.params in
    place and returns the model.
    """
    tagged, n_sites = tag_bn_sites(model.params)
    if n_sites == 0:
        return model
    collector = make_bn_collector(model.apply, rng)
    sums = {}
    counts = {}
    for xb in batches:
        xb = jnp.asarray(np.asarray(xb))
        stats = jax.tree_util.tree_map(np.asarray, collector(tagged, xb))
        for sid_arr, mean, var, _n in stats:
            sid_arr = np.asarray(sid_arr)
            flat_ids = sid_arr.reshape(-1) if sid_arr.ndim else sid_arr[None]
            sid = int(flat_ids[0])
            acc = sums.setdefault(sid, [0.0, 0.0])
            acc[0] = acc[0] + mean
            acc[1] = acc[1] + var
            counts[sid] = counts.get(sid, 0) + 1

    def walk(node):
        if not isinstance(node, dict):
            if isinstance(node, (list, tuple)):
                t = [walk(v) for v in node]
                return type(node)(t) if not isinstance(node, tuple) else tuple(t)
            return node
        out = {k: walk(v) for k, v in node.items() if k != "_bn_id"}
        if "running_mean" in node and "_bn_id" in node:
            sid_arr = np.asarray(node["_bn_id"])
            sid = int(sid_arr.reshape(-1)[0]) if sid_arr.ndim else int(sid_arr)
            if sid in sums:
                n = counts[sid]
                mean = sums[sid][0] / n
                var = sums[sid][1] / n
                out["running_mean"] = jnp.asarray(mean, node["running_mean"].dtype)
                out["running_var"] = jnp.asarray(var, node["running_var"].dtype)
        return out

    model.params = walk(tagged)
    model._jit_cache.clear()
    return model
