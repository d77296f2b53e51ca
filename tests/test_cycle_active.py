import jittor_mlp_tpu as jm
from parity import check_parity


def test_cycle_mlp_parity():
    check_parity(
        "cycle_mlp",
        "CycleNet",
        jm.models.cycle_mlp.CycleNet,
        dict(
            layers=[1, 2],
            embed_dims=[16, 32],
            transitions=[True, True],
            mlp_ratios=[2, 2],
            num_classes=10,
        ),
        input_shape=(2, 3, 32, 32),
    )


def test_cycle_mlp_skip_lam_parity():
    check_parity(
        "cycle_mlp",
        "CycleNet",
        jm.models.cycle_mlp.CycleNet,
        dict(
            layers=[2],
            embed_dims=[20],  # not divisible by 3: uneven offset cycle groups
            transitions=[True],
            mlp_ratios=[2],
            skip_lam=2.0,
            qkv_bias=True,
            num_classes=10,
        ),
        input_shape=(2, 3, 32, 32),
    )


def test_active_mlp_parity():
    check_parity(
        "active_mlp",
        "ActiveMLP",
        jm.models.active_mlp.ActiveMLP,
        dict(
            depths=[2, 2],
            embed_dims=[16, 32],
            mlp_ratios=[2, 2],
            share_dims=[2, 4],
            intv=2,
            num_classes=10,
        ),
        input_shape=(2, 3, 32, 32),
    )


def test_active_mlp_intv_parity():
    # depth 4 with intv 2: offsets regenerated mid-stage
    check_parity(
        "active_mlp",
        "ActiveMLP",
        jm.models.active_mlp.ActiveMLP,
        dict(
            depths=[4],
            embed_dims=[16],
            mlp_ratios=[2],
            share_dims=[2],
            intv=2,
            num_classes=10,
        ),
        input_shape=(2, 3, 32, 32),
    )
