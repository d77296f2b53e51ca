"""Device-mesh construction for data/tensor-parallel execution.

The reference has zero distributed support (SURVEY.md §2.4); here DP/TP are
first-class: a 2-D ('data', 'model') mesh whose collectives ride ICI. Batch
shards over 'data'; wide FF hidden dimensions shard over 'model'.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices=None, model_parallel=1, devices=None):
    """Build a ('data', 'model') mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    arr = np.array(devices).reshape(n_devices // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))
