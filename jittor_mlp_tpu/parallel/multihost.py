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
    # NB: probe via is_initialized(), never jax.process_count() — the latter
    # initializes the XLA backend, after which distributed init is rejected
    if jax.distributed.is_initialized():
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


def process_batch_offset(mesh, global_batch_size):
    """Row offset of THIS process's share within the global batch: the sum
    of the shares of all lower-process_index hosts (the concatenation order
    ``global_batch`` assembles)."""
    n_data = mesh.devices.shape[0]
    per_row = global_batch_size // n_data
    me = jax.process_index()
    off = 0
    for i in range(n_data):
        owner = min(d.process_index for d in mesh.devices[i].flat)
        if owner < me:
            off += per_row
    return off


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


# ---------------------------------------------------------------------------
# Executable self-test: a REAL 2-process jax.distributed run on local CPU.
#
# The pod path above used to be exercised only by mocked unit tests; this
# spawns N actual processes (each with its own virtual CPU devices), joins
# them through a local coordinator, runs one DP x TP train step on a tiny
# zoo model through the exact production helpers (initialize -> make_pod_mesh
# -> global_batch -> init_sharded -> make_train_step), and the launcher
# asserts the distributed loss/param-norm agree with an identically-shaped
# single-process run. Cross-host collectives ride Gloo here; on a pod the
# same code rides DCN.
# ---------------------------------------------------------------------------


def _selftest_step(num_processes, model_parallel=2):
    """One deterministic DP x TP train step; returns (loss, param_norm).

    Runs under whatever process topology the caller established: the mesh
    shape (and therefore the collective schedule) depends only on the global
    device count, so a 2-process run must reproduce the single-process
    numbers to f32 reduction noise."""
    import optax

    import jax.numpy as jnp

    import jittor_mlp_tpu as jm
    from .train import init_sharded, make_train_step

    mesh = make_pod_mesh(model_parallel=model_parallel)
    model = jm.MLPMixerForImageClassification(
        d_model=64, depth=2, patch_size=4, image_size=8, num_classes=16,
        expansion_factor=4,
    )
    optimizer = optax.adamw(1e-3)
    params, opt_state, _ = init_sharded(model.params, optimizer, mesh)
    step = make_train_step(model.apply, optimizer)

    n_global = 2 * mesh.devices.shape[0]
    rng = np.random.default_rng(5)
    full_img = rng.standard_normal((n_global, 3, 8, 8)).astype(np.float32)
    full_lab = rng.integers(0, 16, size=(n_global,)).astype(np.int32)
    local_n = process_batch_size(mesh, n_global)
    off = process_batch_offset(mesh, n_global)
    batch = global_batch(mesh, {
        "image": full_img[off:off + local_n],
        "label": full_lab[off:off + local_n],
    })

    with mesh:
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(0)
        )

    @jax.jit
    def pnorm(p):
        sq = sum(
            jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree_util.tree_leaves(p)
            if jnp.issubdtype(l.dtype, jnp.floating)
        )
        return jnp.sqrt(sq)

    return float(loss), float(pnorm(params))


def _selftest_worker(process_id, num_processes, coordinator, out_path):
    """Subprocess body (invoked via ``python -m ..parallel.multihost``)."""
    import json

    if num_processes > 1:
        initialize(coordinator_address=coordinator,
                   num_processes=num_processes, process_id=process_id)
        assert jax.process_count() == num_processes, jax.process_count()
    loss, pn = _selftest_step(num_processes)
    with open(out_path, "w") as f:
        json.dump({"loss": loss, "param_norm": pn,
                   "n_devices": len(jax.devices()),
                   "n_local": len(jax.local_devices())}, f)


def run_local_selftest(num_processes=2, devices_per_process=4, timeout=600):
    """Launch the distributed self-test: ``num_processes`` real OS processes
    (each a separate JAX runtime with ``devices_per_process`` virtual CPU
    devices) plus one single-process reference with the identical global
    topology; assert loss and post-step param norm agree.

    Returns the dict of results for reporting. Used by
    tests/test_multihost_real.py and the driver's dryrun_multichip."""
    import json
    import os
    import socket
    import subprocess
    import sys
    import tempfile

    with socket.socket() as s:  # grab a free loopback port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    def env_for(n_dev):
        env = dict(os.environ)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={n_dev}")
        env["XLA_FLAGS"] = " ".join(flags)
        env["JAX_PLATFORMS"] = "cpu"
        return env

    results = {}
    with tempfile.TemporaryDirectory() as td:
        def launch(pid, nproc, n_dev, tag):
            out = os.path.join(td, f"{tag}.json")
            code = (
                "import jax; jax.config.update('jax_platforms', 'cpu'); "
                "from jittor_mlp_tpu.parallel import multihost as mh; "
                f"mh._selftest_worker({pid}, {nproc}, {coord!r}, {out!r})"
            )
            return out, subprocess.Popen(
                [sys.executable, "-c", code], env=env_for(n_dev),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )

        procs = [launch(i, num_processes, devices_per_process, f"w{i}")
                 for i in range(num_processes)]
        n_total = num_processes * devices_per_process
        procs.append(launch(0, 1, n_total, "ref"))
        for (out, p), tag in zip(procs, [f"w{i}" for i in
                                         range(num_processes)] + ["ref"]):
            so, se = p.communicate(timeout=timeout)
            assert p.returncode == 0, (
                f"{tag} failed rc={p.returncode}\nstdout:{so}\nstderr:{se}"
            )
            with open(out) as f:
                results[tag] = json.load(f)

    ref = results["ref"]
    assert ref["n_devices"] == n_total
    for i in range(num_processes):
        w = results[f"w{i}"]
        assert w["n_devices"] == n_total and w["n_local"] == \
            devices_per_process, w
        for key in ("loss", "param_norm"):
            rel = abs(w[key] - ref[key]) / max(1.0, abs(ref[key]))
            assert rel <= 1e-5, (
                f"worker {i} {key} {w[key]!r} vs single-process "
                f"{ref[key]!r} (rel {rel:.2e})"
            )
    return results


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) >= 2 and _sys.argv[1] == "--selftest":
        print(run_local_selftest())
    else:
        raise SystemExit("usage: python -m jittor_mlp_tpu.parallel.multihost "
                         "--selftest")
