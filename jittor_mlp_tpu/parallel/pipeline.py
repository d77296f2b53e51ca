"""Pipeline parallelism over the stacked-block axis (GPipe-style).

The zoo's scan-over-stacked-blocks structure makes pipelining natural: shard
the leading (layer) axis of the stacked params over the 'model' mesh axis so
each device owns a contiguous stage of depth L/P, then stream M microbatches
through the stages with ``lax.ppermute`` hops over ICI. The schedule is the
classic M + P − 1 step pipeline; bubble steps skip the stage compute with
``lax.cond`` (no wasted FLOPs); outputs accumulate on the last stage and are
returned everywhere via psum.

Composes with data parallelism: pass ``data_axis='data'`` and the microbatch
dimension shards over the data axis while activations hop stages over the
'model' axis — every collective rides ICI. ``pipeline_runner`` plugs this
into any scan-over-blocks zoo model (the factories take ``block_runner=``),
and the resulting apply differentiates through ppermute, so
``make_train_step`` over a pipelined model is a microbatched pipeline-parallel
training step. The reference has zero distributed support (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core import nnf


def pipeline_blocks(mesh, block_fn, axis="model", data_axis=None):
    """Build fn(stacked_params, x) running blocks as a P-stage pipeline.

    stacked_params: pytree with leading layer axis L (L % P == 0); sharded
    over ``axis`` so stage d holds layers [d·L/P, (d+1)·L/P).
    x: (M, mb, ...) microbatched input. With ``data_axis`` set, the
    microbatch dimension (axis 1) additionally shards over that mesh axis
    (DP×PP). Returns (M, mb, ...).
    """
    n_stages = mesh.shape[axis]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    n_data = mesh.shape[data_axis] if data_axis is not None else 1

    def staged(params_local, x):
        idx = lax.axis_index(axis)
        d_idx = lax.axis_index(data_axis) if data_axis is not None else 0
        M, local_b = x.shape[0], x.shape[1]
        # this shard's position in the ORIGINAL batch order: the runner
        # reshaped (B,..) -> (M, B/M,..) and shard_map split axis 1 over
        # 'data', so microbatch m / data-shard d starts at global sample
        # m*(B/M) + d*local_b. drop_path slices its mask window there
        # (nnf.sample_window_scope) so stochastic depth stays per-sample
        # and bit-identical to the dense draw.
        global_b = M * local_b * n_data

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
            # stage `idx` processes microbatch t-idx at step t (it entered
            # the pipeline idx hops ago); bubble steps clip harmlessly
            mb_id = jnp.clip(t - idx, 0, M - 1)
            offset = mb_id * (local_b * n_data) + d_idx * local_b
            # bubble steps skip the stage compute entirely (lax.cond is a
            # real branch here — `active` is a scalar, not vmapped)
            with nnf.sample_window_scope(global_b, offset):
                y = lax.cond(active, local_stage, lambda _: zero, h)
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

    def run(stacked_params, x):
        if data_axis is None:
            xspec = P()
        else:
            xspec = P(None, data_axis, *([None] * (x.ndim - 2)))
        sm = shard_map(
            staged,
            mesh=mesh,
            in_specs=(P(axis), xspec),
            out_specs=xspec,
            check_vma=False,
        )
        return sm(stacked_params, x)

    return run


def pipeline_runner(mesh, microbatches, axis="model", data_axis=None):
    """A ``block_runner`` for zoo factories: pipeline the scanned blocks.

    Splits the batch into ``microbatches`` equal microbatches (batch %
    microbatches == 0), streams them through the stage pipeline, and merges
    back — a drop-in replacement for nnf.scan_blocks, so e.g.

        runner = pipeline_runner(mesh, microbatches=4, data_axis='data')
        model = jm.MLPMixerForImageClassification(block_runner=runner)

    runs the real zoo model pipeline-parallel (and, through
    make_train_step, trains it GPipe-style with microbatched grads).
    """

    def runner(block_fn, stacked_params, x):
        B = x.shape[0]
        assert B % microbatches == 0, (B, microbatches)
        xmb = x.reshape(microbatches, B // microbatches, *x.shape[1:])
        pipe = pipeline_blocks(mesh, block_fn, axis=axis, data_axis=data_axis)
        y = pipe(stacked_params, xmb)
        return y.reshape(B, *y.shape[2:])

    return runner


def shard_stacked_params(params, mesh, axis="model"):
    """NamedShardings putting the leading layer axis of every leaf on ``axis``."""
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))), params
    )


def pipeline_shardings(params, mesh, blocks_key="blocks", axis="model"):
    """Model-level placement for a pipelined model: every leaf living under
    a ``blocks`` subtree (at ANY nesting depth — flat models keep it at top
    level, hierarchical models like as_mlp carry one per stage inside
    ``layers[i]``) shards its leading layer axis over ``axis`` (stage
    ownership); every other leaf (stems, heads, per-stage downsamples)
    replicates."""
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())

    def spec_for(path, x):
        in_blocks = False
        for i, k in enumerate(path):
            if getattr(k, "key", None) == blocks_key:
                # a LIST of per-block dicts (models that stack at trace
                # time, e.g. swin_mlp) has a sequence index right after
                # 'blocks' — those leaves carry no leading layer axis, so
                # they replicate; stacked subtrees shard their layer axis
                nxt = path[i + 1] if i + 1 < len(path) else None
                in_blocks = not hasattr(nxt, "idx")
                break
        if in_blocks and getattr(x, "ndim", 0) >= 1:
            return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return rep

    return jax.tree_util.tree_map_with_path(spec_for, params)
