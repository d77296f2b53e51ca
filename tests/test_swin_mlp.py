import jittor_mlp_tpu as jm
from parity import check_parity


def test_swin_mlp_parity():
    check_parity(
        "swin_mlp",
        "SwinMLP",
        jm.SwinMLP,
        dict(
            img_size=32,
            patch_size=4,
            num_classes=10,
            embed_dim=16,
            depths=[2, 2],
            num_heads=[2, 4],
            window_size=4,
            drop_path_rate=0.0,
        ),
        input_shape=(2, 3, 32, 32),
    )


def test_swin_mlp_ape_and_small_window():
    # second stage resolution (4) <= window (4): exercises the no-shift clamp
    check_parity(
        "swin_mlp",
        "SwinMLP",
        jm.SwinMLP,
        dict(
            img_size=32,
            patch_size=4,
            num_classes=10,
            embed_dim=16,
            depths=[2, 2, 2],
            num_heads=[2, 4, 8],
            window_size=4,
            ape=True,
            drop_path_rate=0.0,
        ),
        input_shape=(2, 3, 32, 32),
    )
