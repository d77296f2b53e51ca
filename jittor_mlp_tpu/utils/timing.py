"""On-chip timing that is trustworthy on this runtime.

Two facts shape the protocol (see bench.py, memory: axon-tpu-quirks):
``jax.block_until_ready`` does not wait over the axon tunnel, and device→host
bulk transfers are pathologically slow. So: run N iterations inside one jitted
``lax.fori_loop`` with a data dependency between iterations, reduce to one
scalar, fetch it (the only true sync), and difference t(N) − t(base) to cancel
dispatch/sync overhead.
"""

from __future__ import annotations

import time

import numpy as np


def throughput(apply_fn, params, batch_shape, iters=20, dtype=None, repeats=3):
    """images/sec of ``apply_fn(params, x)`` for device-resident input of
    ``batch_shape`` (NCHW). Generates input on device; never moves more than a
    scalar across the host link inside the timed region."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    dtype = dtype or jnp.bfloat16

    @jax.jit
    def run(params, n):
        x = jax.random.normal(jax.random.PRNGKey(0), batch_shape, dtype)

        def body(i, carry):
            acc, x = carry
            xp = x + (acc * 1e-8).astype(dtype)
            out = apply_fn(params, xp)
            return acc + out.reshape(-1)[0].astype(jnp.float32), x

        acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0.0), x))
        return acc

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run(params, n))  # scalar fetch = true sync
            best = min(best, time.perf_counter() - t0)
        return best

    timed(1)  # compile
    dt = timed(iters) - timed(1)
    # small batches push the whole window under dispatch noise (measured:
    # b1 deltas can go NEGATIVE); widen until the delta is trustworthy
    while dt < 0.02 and iters < 20_000:
        iters *= 4
        dt = timed(iters) - timed(1)
    assert dt > 0, f"unstable timing (dt={dt:.4f}s at iters={iters})"
    return batch_shape[0] * (iters - 1) / dt
