import jittor_mlp_tpu as jm
from parity import check_parity


def test_mlp_mixer_parity_small():
    check_parity(
        "mlp_mixer",
        "MLPMixerForImageClassification",
        jm.MLPMixerForImageClassification,
        dict(
            in_channels=3,
            d_model=64,
            num_classes=10,
            patch_size=8,
            image_size=32,
            depth=3,
            expansion_factor=2,
        ),
        input_shape=(2, 3, 32, 32),
    )


def test_mlp_mixer_init_and_shapes():
    m = jm.MLPMixerForImageClassification(
        d_model=32, num_classes=7, patch_size=8, image_size=32, depth=2
    )
    import numpy as np

    out = m(np.zeros((3, 3, 32, 32), dtype=np.float32))
    assert out.shape == (3, 7)


def test_mixer_non_square_image():
    from parity import check_parity

    check_parity(
        "mlp_mixer",
        "MLPMixerForImageClassification",
        jm.MLPMixerForImageClassification,
        dict(d_model=32, num_classes=10, patch_size=8, image_size=(32, 64),
             depth=2, expansion_factor=2),
        input_shape=(2, 3, 32, 64),
    )
