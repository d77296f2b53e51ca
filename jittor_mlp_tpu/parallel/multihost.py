"""Multi-host (pod-slice) execution: process bring-up and host-local batch
feeding.

The reference is single-GPU-only (SURVEY §2.4); this is the DCN half of the
TPU story. One JAX process runs per host; `initialize()` joins them into one
logical runtime (ICI inside a slice, DCN across hosts), `make_pod_mesh`
builds the ('data','model') mesh over the global device set with 'model'
kept intra-host (TP collectives must ride ICI, never DCN), and
`global_batch` assembles a jax.Array whose shards are fed host-locally — no
host ever materializes the global batch.

    multihost.initialize()                      # no-op off-pod
    mesh = multihost.make_pod_mesh(model_parallel=2)
    batch = multihost.global_batch(mesh, {"image": local_imgs,
                                          "label": local_labels})

Single-process runs (tests, the 1-chip axon tunnel, CPU meshes) take the
same code path: initialize() degrades to a no-op and global_batch to a
device_put, so trainers are written once.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


_POD_ENV_MARKERS = (
    # explicit-coordinator environments: when any of these is set, a failed
    # initialize() is a real bring-up error
    "MEGASCALE_COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
)


def _looks_like_pod():
    import os

    if any(os.environ.get(m) for m in _POD_ENV_MARKERS):
        return True
    # multi-host TPU VMs list every worker; single-host VMs (and the axon
    # tunnel) set a single hostname, which is not a pod
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    for var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
        try:
            if int(os.environ.get(var, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Join the multi-process JAX runtime.

    On TPU pods the three arguments are discovered from the metadata server,
    so a bare ``initialize()`` is correct; off-pod (single process, no
    coordinator configured) this is a no-op. Safe to call more than once.

    A failed auto-discovery is only treated as "off-pod" when no pod
    environment markers are present; on a host that IS part of a pod a
    swallowed transient coordinator failure would silently degrade to N
    independent single-host runs (no cross-host gradient sync), so there
    the exception propagates."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            if _looks_like_pod():
                raise  # real pod bring-up failure — do not train unsynced
            return  # single-process environment — nothing to join
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_pod_mesh(model_parallel=1, devices=None):
    """('data','model') mesh over all global devices, 'model' intra-host.

    Devices are ordered so each host's devices are contiguous and the
    model-parallel groups never cross a host boundary: TP all-reduces run
    every layer and must stay on ICI; DP gradient reduction is once per step
    and may ride DCN."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    per_proc = {}
    for d in devices:
        per_proc.setdefault(d.process_index, []).append(d)
    ordered = []
    for pid in sorted(per_proc):
        host = sorted(per_proc[pid], key=lambda d: d.id)
        assert len(host) % model_parallel == 0, (
            f"host {pid} has {len(host)} devices, not divisible by "
            f"model_parallel={model_parallel} — TP groups would cross DCN"
        )
        ordered.extend(host)
    arr = np.array(ordered).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def process_batch_size(mesh, global_batch_size):
    """This process's share of the global batch (data-sharded inputs):
    one row-share per data-axis index that has a device on this host."""
    n_data = mesh.devices.shape[0]
    assert global_batch_size % n_data == 0, (global_batch_size, n_data)
    me = jax.process_index()
    rows = sum(
        1 for i in range(n_data)
        if any(d.process_index == me for d in mesh.devices[i])
    )
    return global_batch_size // n_data * rows


def global_batch(mesh, local_arrays, spec=None):
    """Assemble global jax.Arrays from per-host local data.

    local_arrays: dict of numpy arrays holding THIS process's rows of the
    global batch (concatenated across processes in process_index order).
    Returns the same dict as global arrays sharded P('data') over the mesh.
    Single-process: equivalent to a sharded device_put."""
    if spec is None:
        spec = P("data")

    def put(x):
        sh = NamedSharding(mesh, spec if x.ndim > 0 else P())
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return {k: put(np.asarray(v)) for k, v in local_arrays.items()}
