"""Pipeline parallelism over the stacked-block axis (GPipe-style).

The zoo's scan-over-stacked-blocks structure makes pipelining natural: shard
the leading (layer) axis of the stacked params over the 'model' mesh axis so
each device owns a contiguous stage of depth L/P, then stream M microbatches
through the stages with ``lax.ppermute`` hops over ICI. The schedule is the
classic M + P − 1 step pipeline; outputs accumulate on the last stage and are
returned everywhere via psum.

This is a forward pipeline (inference / activation streaming); models here are
small enough that DP+TP covers training (SURVEY §2.4), so pp exists to
demonstrate the scaling recipe on real collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def pipeline_blocks(mesh, block_fn, axis="model"):
    """Build fn(stacked_params, x) running blocks as a P-stage pipeline.

    stacked_params: pytree with leading layer axis L (L % P == 0); sharded
    over ``axis`` so stage d holds layers [d·L/P, (d+1)·L/P).
    x: (M, mb, ...) microbatched input (replicated). Returns (M, mb, ...).
    """
    n_stages = mesh.shape[axis]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def staged(params_local, x):
        idx = lax.axis_index(axis)
        M = x.shape[0]

        def local_stage(h):
            def body(carry, bp):
                return block_fn(bp, carry), None

            out, _ = lax.scan(body, h, params_local)
            return out

        zero = jnp.zeros_like(x[0])

        def step(carry, t):
            recv, outs = carry
            # stage 0 ingests microbatch t; others take the ppermute'd input
            mb_in = x[jnp.clip(t, 0, M - 1)]
            h = jnp.where(idx == 0, mb_in, recv)
            active = (t - idx >= 0) & (t - idx < M)
            y = jnp.where(active, local_stage(h), zero)
            # last stage records its finished microbatch t-(P-1)
            out_slot = jnp.clip(t - (n_stages - 1), 0, M - 1)
            is_out = active & (idx == n_stages - 1)
            outs = lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(is_out, y, outs[out_slot]),
                out_slot,
                axis=0,
            )
            nxt = lax.ppermute(y, axis, perm)
            return (nxt, outs), None

        init = (zero, jnp.zeros_like(x))
        (_, outs), _ = lax.scan(
            step, init, jnp.arange(M + n_stages - 1)
        )
        # outputs live on the last stage only; psum broadcasts them
        return lax.psum(jnp.where(idx == n_stages - 1, outs, 0.0), axis)

    return shard_map(
        staged,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )


def shard_stacked_params(params, mesh, axis="model"):
    """NamedShardings putting the leading layer axis of every leaf on ``axis``."""
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))), params
    )
