import jittor_mlp_tpu as jm
from parity import check_parity


def test_conv_mixer_parity():
    check_parity(
        "conv_mixer",
        "ConvMixer",
        jm.ConvMixer,
        dict(dim=32, depth=3, kernel_size=5, patch_size=4, n_classes=10),
        input_shape=(2, 3, 32, 32),
    )


def test_conv_mlp_parity():
    check_parity(
        "conv_mlp",
        "ConvMLP",
        jm.models.conv_mlp.ConvMLP,
        dict(
            depth=[1, 2],
            d_model=[32, 64],
            expansion_factor=[2, 2],
            channels=16,
            n_conv_blocks=2,
            num_classes=10,
        ),
        input_shape=(2, 3, 64, 64),
    )


def test_convmlp_s_builds():
    m = jm.convmlp_s()
    assert m.param_count() > 5e6
