import jittor_mlp_tpu as jm
from parity import check_parity


def test_as_mlp_parity():
    check_parity(
        "as_mlp",
        "AS_MLP",
        jm.AS_MLP,
        dict(
            img_size=32,
            patch_size=4,
            num_classes=10,
            embed_dim=16,
            depths=[2, 2],
            shift_size=3,
            drop_path_rate=0.0,
        ),
        input_shape=(2, 3, 32, 32),
    )


def test_as_mlp_no_bias_parity():
    check_parity(
        "as_mlp",
        "AS_MLP",
        jm.AS_MLP,
        dict(
            img_size=32,
            patch_size=4,
            num_classes=10,
            embed_dim=20,  # not divisible by shift 3: uneven groups
            depths=[2],
            shift_size=3,
            as_bias=False,
            drop_path_rate=0.0,
        ),
        input_shape=(2, 3, 32, 32),
    )
