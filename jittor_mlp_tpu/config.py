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
