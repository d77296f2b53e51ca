"""StableHLO export/deserialize roundtrip (deploy.py): the serialized blob
must reproduce the live model's logits (to float-rounding — the export
compiles separately, so fusion order may differ by 1 ulp), with weights
baked in: no model code or params needed at load time."""

import numpy as np

import jittor_mlp_tpu as jm


def test_export_roundtrip_exact(tmp_path):
    model = jm.MLPMixerForImageClassification(
        image_size=16, patch_size=4, d_model=32, depth=2, num_classes=8,
        use_pallas=False,
    )
    x = np.random.default_rng(0).standard_normal((4, 3, 16, 16)).astype(
        np.float32
    )
    want = np.asarray(model(x))

    path = str(tmp_path / "m.shlo")
    jm.deploy.save_exported(model, path, batch_size=4, image_size=16)

    fwd = jm.deploy.load_exported(path)
    got = np.asarray(fwd(x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # the blob is self-contained: mutating the live model must not affect it
    import jax

    model.params = jax.tree.map(lambda v: v * 0, model.params)
    got2 = np.asarray(fwd(x))
    np.testing.assert_array_equal(got2, got)


def test_export_shape_is_fixed(tmp_path):
    import pytest

    model = jm.MLPMixerForImageClassification(
        image_size=16, patch_size=4, d_model=32, depth=2, num_classes=8,
        use_pallas=False,
    )
    path = str(tmp_path / "m.shlo")
    jm.deploy.save_exported(model, path, batch_size=4, image_size=16)
    fwd = jm.deploy.load_exported(path)
    with pytest.raises(Exception):
        fwd(np.zeros((2, 3, 16, 16), np.float32))  # wrong batch


def test_export_int8_bakes_quantized_path(tmp_path):
    """int8=True traces under int8_mode: the blob reproduces the live
    int8 forward exactly and differs from the f32 graph's output."""
    from jittor_mlp_tpu import config

    model = jm.MLPMixerForImageClassification(
        image_size=16, patch_size=4, d_model=32, depth=2, num_classes=8,
        use_pallas=False,
    )
    x = np.random.default_rng(1).standard_normal((4, 3, 16, 16)).astype(
        np.float32
    )
    f32 = np.asarray(model(x))
    with config.int8_mode():
        live_q = np.asarray(model(x))

    path = str(tmp_path / "m_int8.shlo")
    jm.deploy.save_exported(model, path, batch_size=4, image_size=16,
                            int8=True)
    got = np.asarray(jm.deploy.load_exported(path)(x))
    np.testing.assert_allclose(got, live_q, rtol=1e-6, atol=1e-6)
    assert np.abs(got - f32).max() > 0  # genuinely the quantized graph
