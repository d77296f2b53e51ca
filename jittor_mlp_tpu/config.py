"""Global numeric configuration.

The reference zoo runs fp32 on CUDA (compare.py:20,141-186). On TPU, fp32 matmuls
default to a lower-precision MXU passes; we expose two knobs:

- ``matmul_precision``: forwarded to jnp.dot / lax.conv as ``precision=``.
  'default' for throughput (bf16 MXU passes), 'highest' for parity testing.
- ``compute_dtype``: activations dtype. bfloat16 for the benchmark path.

Use the context manager ``parity_mode()`` in tests.
"""

from contextlib import contextmanager

import jax.numpy as jnp

matmul_precision = None  # None → jax default; or 'highest' for parity on TPU
compute_dtype = jnp.float32
remat = False  # wrap every scanned block in jax.checkpoint (training memory)
int8_matmul = False  # route dense ops through dynamic W8A8 int8 (inference)
# When truthy, Model.__call__ compiles with XLA's low-effort knobs
# (exec_time_optimization_effort/memory_fitting_effort = -1). Numerics-only
# runs (parity sweeps) set this via env JMT_FAST_COMPILE=1 when a model's
# default compile cannot fit this environment's process window; it changes
# compile time, not semantics (any valid schedule is 'the hardware result').
fast_compile = bool(int(__import__("os").environ.get("JMT_FAST_COMPILE", "0")))
# Fused Pallas BACKWARD for the mixer block's trainable path
# (ops/pallas/mixer_block_bwd.py). Off by default: measured SLOWER than the
# recompute scheme (Pallas forward + XLA VJP of the plain block) on the
# Mixer-B/16 mixed train step — 1,190 vs 1,433 img/s at b128 (see
# docs/PERFORMANCE.md "negative results"). Kept as an option because its
# residual profile differs (stores h instead of re-running the token mix),
# which can matter under tight HBM at large depth.
pallas_bwd = False


@contextmanager
def remat_mode():
    """Activation checkpointing on every scanned block stack, zoo-wide.

    The per-block activations of a deep model's backward often exceed HBM
    (Mixer-B/16 b128 f32 needs 25.6 GB of 15.75 GB); under this context any
    model built OR traced inside recomputes each block in the backward
    instead — the trade the reference exposes per-model via its
    ``use_checkpoint`` flags (SURVEY §5), available here for every factory
    because all of them run their blocks through nnf.scan_blocks*.

    The flag is read at TRACE time. ``Model.__call__`` keys its jit cache on
    it, so calling a model inside the context always takes effect; for a
    hand-jitted step (e.g. ``make_train_step``), the FIRST call of the jitted
    function must happen inside the context — an already-compiled executable
    is not retraced by entering it (rebuild the step instead)."""
    global remat
    old = remat
    remat = True
    try:
        yield
    finally:
        remat = old


@contextmanager
def parity_mode():
    """fp32 + highest-precision matmuls, for numerical comparison vs reference."""
    global matmul_precision, compute_dtype
    old = (matmul_precision, compute_dtype)
    matmul_precision, compute_dtype = "highest", jnp.float32
    try:
        yield
    finally:
        matmul_precision, compute_dtype = old


@contextmanager
def bf16_mode():
    """bfloat16 activations for maximum MXU throughput."""
    global matmul_precision, compute_dtype
    old = (matmul_precision, compute_dtype)
    matmul_precision, compute_dtype = None, jnp.bfloat16
    try:
        yield
    finally:
        matmul_precision, compute_dtype = old


@contextmanager
def int8_mode():
    """Dynamic W8A8 int8 inference on every dense op (serving).

    Inside the context, nnf.linear / conv1x1 / the 1x1-conv fast path /
    patch_embed / conv1d_token quantize activations per-token and weights
    per-output-channel on the fly and run the contraction as an
    int8×int8→int32 ``lax.dot_general`` — the v5e MXU executes int8 at 2×
    its bf16 FLOP rate (394 vs 197 TOPS), so matmul-bound models gain up to
    2× with no calibration pass (scales are computed from the live tensor,
    never stale). Inference-only: jnp.round's gradient is zero, so
    make_train_step refuses to trace under this context. Coverage: every
    dense op routed through nnf (which is where the zoo's matmul FLOPs
    live); model-specific folded einsum contractions (SwinMLP's 6D window
    einsum, ViP/Hire folded mixers) stay at full precision — quantization
    only ever *reduces* precision on the covered ops, never accuracy of
    the rest. Accuracy pinned by tests/test_int8.py (logit bounds)."""
    global int8_matmul
    old = int8_matmul
    int8_matmul = True
    try:
        yield
    finally:
        int8_matmul = old


def enable_compile_cache(path=None):
    """Persistent XLA compile cache — first compiles over the axon tunnel take
    minutes; cached reruns skip them. Call from entry points (bench/compare/
    examples). Prints a note instead of silently degrading when unsupported."""
    import os
    import sys

    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.pardir, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # config option renamed/removed in a future jax
        print(f"[jittor_mlp_tpu] compile cache disabled: {e}", file=sys.stderr)
