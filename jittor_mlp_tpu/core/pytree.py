"""torch state_dict ↔ JAX param-pytree plumbing.

The parity contract of the reference is "load the torch model's state_dict and
reproduce its outputs" (/root/reference/compare.py:144-186). We keep the params
pytree isomorphic to the torch module tree: dotted state_dict keys become nested
dicts, tensors become jnp arrays in their torch layout. Repeated homogeneous
blocks ('model.0', 'model.1', ...) can be stacked on a leading axis to drive
``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SKIP_SUFFIXES = ("num_batches_tracked",)


def _to_np(t):
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def nest(state_dict, dtype=None):
    """'a.b.c' → {'a': {'b': {'c': array}}}, skipping BN bookkeeping buffers."""
    root: dict = {}
    for key, value in state_dict.items():
        if any(key.endswith(s) for s in _SKIP_SUFFIXES):
            continue
        parts = key.split(".")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        arr = jnp.asarray(_to_np(value))
        if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        node[parts[-1]] = arr
    return root


def flatten(params, prefix=""):
    """Inverse of nest (best-effort): nested dicts → dotted-key dict."""
    out = {}
    for k, v in params.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def stack_layers(layer_dicts):
    """[tree_0, tree_1, ...] (same structure) → one tree with leading L axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_dicts)


def stack_numbered(node):
    """{'0': tree, '1': tree, ...} → stacked tree ordered by int key."""
    keys = sorted(node.keys(), key=int)
    return stack_layers([node[k] for k in keys])


def unstack_layers(stacked, depth):
    """Inverse of stack_layers."""
    return [
        jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(depth)
    ]


def index_layers(stacked, i):
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def cast_floats(params, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )


def param_count(params):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
