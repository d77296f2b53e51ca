import jittor_mlp_tpu as jm
from parity import check_parity


def test_gmlp_parity():
    check_parity(
        "g_mlp",
        "gMLPForImageClassification",
        jm.gMLPForImageClassification,
        dict(
            image_size=32,
            patch_size=8,
            num_classes=10,
            d_model=48,
            d_ffn=96,
            depth=3,
        ),
        input_shape=(2, 3, 32, 32),
    )


def test_resmlp_parity():
    check_parity(
        "res_mlp",
        "ResMLPForImageClassification",
        jm.ResMLPForImageClassification,
        dict(
            in_channels=3,
            d_model=48,
            num_classes=10,
            patch_size=8,
            image_size=32,
            depth=3,
            expansion_factor=2,
        ),
        input_shape=(2, 3, 32, 32),
    )


def test_resmlp_deep_gamma_init():
    m = jm.ResMLPForImageClassification(
        d_model=16, patch_size=8, image_size=16, depth=26, num_classes=4
    )
    import numpy as np

    g1 = np.asarray(m.params["blocks"]["gamma_1"])
    assert np.allclose(g1, 1e-6)
