"""Sequence (token) parallelism for mixer blocks via shard_map + collectives.

The zoo's token counts are small (≤3136 at 224², SURVEY §5), so SP is about
demonstrating the scaling recipe, not necessity: tokens shard over a mesh
axis; channel-mixing is embarrassingly parallel (per-token), and the
token-mixing matmul pair becomes

    t = psum_g( W1[:, local] @ LN(x_local) )      — partial contraction + psum
    y_local = W2[local_out, :] @ gelu(t + b1)     — row-sharded second matmul

i.e. Megatron-style 1-D tensor parallelism applied to the token dimension,
with the all-reduce riding ICI. Used by __graft_entry__.dryrun_multichip and
tested for exact agreement with the dense block on the virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.7 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core import nnf


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def token_parallel_mixer_block(mesh, axis="model"):
    """Build fn(x, params) running one mixer block with tokens sharded on
    ``axis``. params: dict with ln1/ln2 (w, b), token w1 (TD, N), b1 (TD,),
    w2 (N, TD), b2 (N,), channel w3 (CD, D), b3, w4 (D, CD), b4.
    """

    def block(x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, w3, b3, w4, b4):
        # x: (B, N/s, D) local tokens; w1 cols / w2 rows / b2 sharded likewise
        xn = _ln(x, ln1w, ln1b)
        t = jnp.einsum("oi,bid->bod", w1, xn)        # partial over local tokens
        t = lax.psum(t, axis)                         # (B, TD, D) full
        t = nnf.gelu(t + b1[None, :, None])
        y = jnp.einsum("oi,bid->bod", w2, t)          # local output tokens
        h = x + y + b2[None, :, None]
        # channel mix: purely per-token → no communication
        hn = _ln(h, ln2w, ln2b)
        c = nnf.gelu(jnp.matmul(hn, w3.T) + b3)
        return h + jnp.matmul(c, w4.T) + b4

    specs = (
        P(None, axis, None),  # x tokens sharded
        P(), P(),             # ln1
        P(None, axis), P(),   # w1 cols sharded over tokens, b1 replicated
        P(axis, None), P(axis),  # w2 rows + b2 sharded over output tokens
        P(), P(),             # ln2
        P(), P(), P(), P(),   # channel weights replicated
    )
    return shard_map(
        block, mesh=mesh, in_specs=specs, out_specs=P(None, axis, None),
        check_vma=False,
    )


def dense_mixer_block(x, ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, w3, b3, w4, b4):
    """Reference single-device block for agreement tests."""
    xn = _ln(x, ln1w, ln1b)
    t = nnf.gelu(jnp.einsum("oi,bid->bod", w1, xn) + b1[None, :, None])
    h = x + jnp.einsum("oi,bid->bod", w2, t) + b2[None, :, None]
    hn = _ln(h, ln2w, ln2b)
    c = nnf.gelu(jnp.matmul(hn, w3.T) + b3)
    return h + jnp.matmul(c, w4.T) + b4


def _mixer_block_args(bp):
    """Map one stacked mixer block's params (models/mlp_mixer.py structure:
    '0' = PreNormResidual(token Conv1d FF), '1' = PreNormResidual(channel
    Linear FF)) onto token_parallel_mixer_block's 12 weight args."""
    t, c = bp["0"], bp["1"]
    return (
        t["norm"]["weight"], t["norm"]["bias"],
        t["fn"]["net"]["0"]["weight"][:, :, 0], t["fn"]["net"]["0"]["bias"],
        t["fn"]["net"]["3"]["weight"][:, :, 0], t["fn"]["net"]["3"]["bias"],
        c["norm"]["weight"], c["norm"]["bias"],
        c["fn"]["net"]["0"]["weight"], c["fn"]["net"]["0"]["bias"],
        c["fn"]["net"]["3"]["weight"], c["fn"]["net"]["3"]["bias"],
    )


def token_parallel_mixer_runner(mesh, axis="model"):
    """A ``block_runner`` for MLPMixerForImageClassification: run every
    scanned block sequence-parallel, tokens sharded over ``axis``.

        runner = token_parallel_mixer_runner(mesh)
        model = jm.MLPMixerForImageClassification(block_runner=runner)

    Requires num_patches % mesh.shape[axis] == 0. The ``block_fn`` argument
    is ignored — this runner substitutes the token-sharded block math.
    """
    tp_block = token_parallel_mixer_block(mesh, axis)

    def runner(block_fn, stacked_params, x):
        def body(h, bp):
            return tp_block(h, *_mixer_block_args(bp)), None

        y, _ = lax.scan(body, x, stacked_params)
        return y

    return runner


# ---------------------------------------------------------------------------
# ResMLP: second token-sharded family. The block's token mixer is one N×N
# matmul, so the sharded form is a partial contraction over local input
# tokens followed by a psum_scatter over output tokens (reduce-scatter —
# half the bytes of the mixer runner's full psum since every shard only
# needs its own token rows back). Channel FF and affines stay per-token.
# ---------------------------------------------------------------------------


def token_parallel_resmlp_block(mesh, axis="model"):
    """Build fn(x, *weights) running one ResMLP block (models/res_mlp.py
    semantics: pre_affine → +g1·token_mix → post_affine → +g2·FF) with
    tokens sharded on ``axis``."""

    def block(x, pa, pb, g1, wt, bt, qa, qb, g2, w3, b3, w4, b4):
        # x: (B, N/s, D) local tokens; wt cols and bt sharded over tokens
        h = x * pa + pb
        part = jnp.einsum("oi,bid->bod", wt, h)      # (B, N, D) partial sums
        tm = lax.psum_scatter(part, axis, scatter_dimension=1, tiled=True)
        h = h + g1 * (tm + bt[None, :, None])
        h = h * qa + qb
        y = nnf.gelu(jnp.matmul(h, w3.T) + b3)
        return h + g2 * (jnp.matmul(y, w4.T) + b4)

    specs = (
        P(None, axis, None),   # x tokens sharded
        P(), P(), P(),         # pre_affine alpha/beta, gamma_1
        P(None, axis), P(axis),  # token-mix cols + bias over tokens
        P(), P(), P(),         # post_affine alpha/beta, gamma_2
        P(), P(), P(), P(),    # channel FF replicated
    )
    return shard_map(
        block, mesh=mesh, in_specs=specs, out_specs=P(None, axis, None),
        check_vma=False,
    )


def _resmlp_block_args(bp):
    """Map one stacked ResMLP block's params (models/res_mlp.py structure)
    onto token_parallel_resmlp_block's 12 weight args."""
    return (
        bp["pre_affine"]["alpha"].reshape(-1),
        bp["pre_affine"]["beta"].reshape(-1),
        bp["gamma_1"],
        bp["token_mix"]["weight"][:, :, 0], bp["token_mix"]["bias"],
        bp["post_affine"]["alpha"].reshape(-1),
        bp["post_affine"]["beta"].reshape(-1),
        bp["gamma_2"],
        bp["ff"]["net"]["0"]["weight"], bp["ff"]["net"]["0"]["bias"],
        bp["ff"]["net"]["3"]["weight"], bp["ff"]["net"]["3"]["bias"],
    )


_SP_FAMILIES = {
    "mlp_mixer": (token_parallel_mixer_block, _mixer_block_args),
    "res_mlp": (token_parallel_resmlp_block, _resmlp_block_args),
}


def token_parallel_runner(mesh, family="mlp_mixer", axis="model"):
    """A ``block_runner`` running every scanned block of ``family``
    sequence-parallel, tokens sharded over ``axis``:

        runner = token_parallel_runner(mesh, "res_mlp")
        model = jm.ResMLPForImageClassification(block_runner=runner)

    Families: {familes}. Requires num_patches % mesh.shape[axis] == 0. The
    ``block_fn`` argument each factory passes is ignored — the runner
    substitutes the token-sharded block math for that family's params
    structure.""".replace("{familes}", ", ".join(sorted(_SP_FAMILIES)))
    make_block, to_args = _SP_FAMILIES[family]
    tp_block = make_block(mesh, axis)

    def runner(block_fn, stacked_params, x):
        def body(h, bp):
            return tp_block(h, *to_args(bp)), None

        y, _ = lax.scan(body, x, stacked_params)
        return y

    return runner
