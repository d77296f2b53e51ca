import pytest

import jittor_mlp_tpu as jm
from parity import check_parity

LAYERS = [
    {"depth": 1, "dim": 16, "patch_size": 4, "raft_size": 2},
    {"depth": 1, "dim": 32, "patch_size": 2, "raft_size": 2},
]


@pytest.mark.parametrize(
    "mixing", ["ser_pm", "sep_ln_codim_tm", "sep_ln_ch_tm", "original_tm"]
)
def test_raft_mlp_mixing_types(mixing):
    check_parity(
        "raft_mlp",
        "RaftMLP",
        jm.RaftMLP,
        dict(
            layers=LAYERS,
            image_size=16,
            num_classes=10,
            token_mixing_type=mixing,
        ),
        input_shape=(2, 3, 16, 16),
    )


@pytest.mark.parametrize("gap,shortcut", [(True, True), (False, False), (True, False)])
def test_raft_mlp_head_variants(gap, shortcut):
    check_parity(
        "raft_mlp",
        "RaftMLP",
        jm.RaftMLP,
        dict(
            layers=LAYERS,
            image_size=16,
            num_classes=10,
            gap=gap,
            shortcut=shortcut,
        ),
        input_shape=(2, 3, 16, 16),
    )


def test_raft_mlp_interpolated_level():
    check_parity(
        "raft_mlp",
        "RaftMLP",
        jm.RaftMLP,
        dict(
            layers=[{"depth": 1, "dim": 16, "patch_size": 3, "raft_size": 2}],
            image_size=16,
            num_classes=10,
        ),
        input_shape=(2, 3, 16, 16),
        tol=5e-4,  # bilinear resize implementations differ at ulp level
    )
