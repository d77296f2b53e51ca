import jittor_mlp_tpu as jm
from parity import check_parity


def test_sparse_mlp_parity():
    check_parity(
        "sparse_mlp",
        "SparseMLP",
        jm.SparseMLP,
        dict(
            image_size=32,
            patch_size=4,
            num_classes=10,
            d_model=16,
            depth=[2, 2],
            expansion_factor=2,
        ),
        input_shape=(2, 3, 32, 32),
    )


def test_sparse_mlp_patcher_norm_parity():
    check_parity(
        "sparse_mlp",
        "SparseMLP",
        jm.SparseMLP,
        dict(
            image_size=16,
            patch_size=4,
            num_classes=10,
            d_model=16,
            depth=[2],
            expansion_factor=2,
            patcher_norm=True,
        ),
        input_shape=(2, 3, 16, 16),
    )


def test_hire_mlp_parity():
    check_parity(
        "hire_mlp",
        "HireMLP",
        jm.HireMLP,
        dict(
            patch_size=4,
            num_classes=10,
            d_model=[16, 32],
            h=[4, 3],
            w=[4, 3],
            cross_region_step=[2, 1],
            cross_region_interval=2,
            depth=[2, 3],
            expansion_factor=2,
        ),
        input_shape=(2, 3, 32, 32),
    )


def test_hire_mlp_padding_modes():
    for mode in ("constant", "reflect", "replicate"):
        check_parity(
            "hire_mlp",
            "HireMLP",
            jm.HireMLP,
            dict(
                patch_size=4,
                num_classes=10,
                d_model=[16],
                h=[3],
                w=[3],
                cross_region_step=[1],
                cross_region_interval=2,
                depth=[2],
                expansion_factor=2,
                padding_type=mode,
            ),
            input_shape=(2, 3, 32, 32),
        )


def test_sparse_mlp_split_fuse_parity():
    """The d>=192 split-fuse path (three d->d matmuls) must match the torch
    reference exactly like the concat+1x1 path does — this config's second
    stage hits d=192 so both branches run in one forward."""
    check_parity(
        "sparse_mlp",
        "SparseMLP",
        jm.SparseMLP,
        dict(
            image_size=32,
            patch_size=4,
            num_classes=10,
            d_model=96,
            depth=[1, 1],
            expansion_factor=2,
        ),
        input_shape=(2, 3, 32, 32),
    )
