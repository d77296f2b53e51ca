"""Capture nnf.probe intermediates from a jitted forward.

Stage-level tracing for numerics attribution (tools/tpu_numerics.py): models
mark boundaries with ``nnf.probe(tag, x)``; ``capture`` reruns the forward
with a sink installed and returns the tagged intermediates plus the output.
Probe values stay on the executing device — compare them with on-device
reductions and fetch scalars only (bulk device→host fetches are pathological
on tunneled runtimes; see utils/timing.py).
"""

from __future__ import annotations

import jax

from ..core import nnf


def capture(apply_fn, params, x, train=False, rng=None):
    """Run ``apply_fn(params, x)`` once, returning (out, [(tag, value), ...]).

    Compiled fresh on each call (the probe list is part of the trace); tags
    are the static strings passed to nnf.probe, in execution order.
    """
    tags = []

    @jax.jit
    def run(params, x):
        sink = []
        token = nnf._probe_sink
        nnf._probe_sink = sink
        try:
            out = apply_fn(params, x, train=train, rng=rng)
        finally:
            nnf._probe_sink = token
        tags.clear()
        tags.extend(t for t, _v in sink)
        return out, tuple(v for _t, v in sink)

    out, values = run(params, x)
    return out, list(zip(tags, values))
