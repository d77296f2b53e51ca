"""Full-size strict parity at the driver configs (BASELINE.json `configs`).

The regular parity suite runs tiny 32×32 configs; these cases hold the
≤1e-4 north-star gate at the real 224² sizes the driver names — Mixer-B/16,
ResMLP-S24, gMLP-S, ConvMixer-768/32, ConvMLP-M, S2-MLPv2, AS-MLP, HireMLP,
GFNet-H-B, CycleMLP-B2, Sequencer2D-S — through compare.run_parity (strict
max-abs OR max-rel ≤ 1e-4, BN running stats recalibrated first, no escapes).
Marked slow: each case is a full-size torch-CPU forward (plus recalibration
batches for BN models); run with `pytest -m slow`.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import compare  # noqa: E402

DRIVER_CONFIGS = [
    "mlp_mixer",    # Mixer-B/16 (configs[0], also the bench model)
    "res_mlp",      # ResMLP-S24 (configs[1])
    "g_mlp",        # gMLP-S (configs[1])
    "conv_mixer",   # ConvMixer-768/32 (configs[2])
    "conv_mlp",     # ConvMLP-M (configs[2])
    "s2_mlp_v2",    # configs[3]
    "as_mlp",       # configs[3]
    "hire_mlp",     # configs[3]
    "gfnet_h_b",    # GFNet-H-B (configs[4])
    "cycle_mlp",    # CycleMLP-B2 (configs[4])
    "sequencer",    # Sequencer2D-S (configs[4])
]


@pytest.mark.slow
@pytest.mark.parametrize("name", DRIVER_CONFIGS)
def test_fullsize_strict_parity(name):
    r = compare.run_parity(name)
    assert r["parity_ok"], (
        f"{name}: max abs {r['max_abs']:.3e}, max rel {r['max_rel']:.3e} "
        f"(out scale {r['out_scale']:.1e}, "
        f"bn_recalibrated={r['bn_recalibrated']})"
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", sorted(set(compare.CONFIGS) - set(DRIVER_CONFIGS))
)
def test_fullsize_strict_parity_rest_of_zoo(name):
    r = compare.run_parity(name)
    assert r["parity_ok"], (
        f"{name}: max abs {r['max_abs']:.3e}, max rel {r['max_rel']:.3e}"
    )
