"""Multi-host helpers on the single-process virtual mesh: mesh layout
invariants, local-batch accounting, and the degraded single-process paths."""

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from jittor_mlp_tpu.parallel import make_mesh, multihost


def test_initialize_is_noop_single_process():
    multihost.initialize()  # must not raise off-pod
    assert jax.process_count() == 1


def test_make_pod_mesh_shape_and_axes():
    mesh = multihost.make_pod_mesh(model_parallel=2)
    n = len(jax.devices())
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == n // 2 and mesh.shape["model"] == 2
    # TP groups are rows of adjacent same-host devices
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1


def test_process_batch_size_single_process_owns_all():
    mesh = multihost.make_pod_mesh(model_parallel=1)
    assert multihost.process_batch_size(mesh, 64) == 64


def test_global_batch_matches_device_put():
    mesh = make_mesh(len(jax.devices()), model_parallel=2)
    imgs = np.random.default_rng(0).standard_normal((8, 3, 4, 4)).astype(
        np.float32
    )
    labels = np.arange(8, dtype=np.int32)
    out = multihost.global_batch(mesh, {"image": imgs, "label": labels})
    assert out["image"].shape == (8, 3, 4, 4)
    assert out["image"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(out["image"]), imgs)
    np.testing.assert_array_equal(np.asarray(out["label"]), labels)


def test_pod_mesh_feeds_train_step():
    import optax

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu.parallel.train import init_sharded, make_train_step

    mesh = multihost.make_pod_mesh(model_parallel=2)
    model = jm.MLPMixerForImageClassification(
        image_size=8, patch_size=4, d_model=32, depth=2, num_classes=4,
        use_pallas=False,
    )
    opt = optax.sgd(1e-2)
    params, opt_state, _ = init_sharded(model.params, opt, mesh)
    step = make_train_step(model.apply, opt)
    batch = multihost.global_batch(
        mesh,
        {
            "image": np.zeros((8, 3, 8, 8), np.float32),
            "label": np.zeros((8,), np.int32),
        },
    )
    with mesh:
        _, _, loss = step(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_initialize_raises_on_pod_markers(monkeypatch):
    """With a coordinator address configured, a failed join must surface —
    swallowing it would silently train N unsynced single-host replicas."""
    import pytest

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert multihost._looks_like_pod()
    with pytest.raises(Exception):
        multihost.initialize()


def test_single_hostname_is_not_a_pod(monkeypatch):
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not multihost._looks_like_pod()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    assert multihost._looks_like_pod()
