"""Native checkpointing: model params and full train state.

The reference's checkpoint story is torch-file import only (SURVEY §5); this
adds the save/resume half: ``save_params``/``load_params`` for single-file
npz snapshots of a Model's pytree, and orbax-backed ``save_train_state``/
``restore_train_state`` for sharded training state (params + optimizer state +
step), resumable across processes and meshes.
"""

from __future__ import annotations

import os

import numpy as np

import jax


def save_params(model, path):
    """Snapshot model.params to an .npz (leaf order = pytree order)."""
    leaves, treedef = jax.tree_util.tree_flatten(model.params)
    arrays = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, __treedef__=str(treedef), **arrays)
    return path


def load_params(model, path):
    """Restore a save_params snapshot into an identically-built Model."""
    import jax.numpy as jnp

    with np.load(path) as data:
        leaves, treedef = jax.tree_util.tree_flatten(model.params)
        n = len(leaves)
        stored = [k for k in data.files if k.startswith("leaf_")]
        assert len(stored) == n, (
            f"checkpoint has {len(stored)} leaves, model expects {n} — "
            "build the model with the same config before loading"
        )
        new_leaves = [jnp.asarray(data[f"leaf_{i:05d}"]) for i in range(n)]
    model.params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    model._jit_cache.clear()
    return model


def save_train_state(path, params, opt_state, step):
    """Orbax checkpoint of the full training state (sharded-array aware)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path, {"params": params, "opt_state": opt_state, "step": step},
            force=True,
        )
    return path


def restore_train_state(path, params_like, opt_state_like, step_like=0):
    """Restore a save_train_state checkpoint; *_like give structure/sharding."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            path,
            {"params": params_like, "opt_state": opt_state_like,
             "step": step_like},
        )
    return restored["params"], restored["opt_state"], restored["step"]
