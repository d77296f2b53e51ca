"""Generate PARITY.md: max abs/rel forward deviation vs the torch reference
for every model family (small configs, CPU, fp32)."""

import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

import jittor_mlp_tpu as jm
import jittor_mlp_tpu.models.dyna_mlp as dmod
import jittor_mlp_tpu.models.morph_mlp as mmod
import jittor_mlp_tpu.models.sequencer as smod
import jittor_mlp_tpu.models.wave_mlp as wmod
from jittor_mlp_tpu import config
from ref_loader import load_ref, ref_model

SMALL = dict(image_size=32, patch_size=8, num_classes=10)


def build_cases():
    load_ref("morph_mlp").morphmlp_settings["XS"] = mmod.morphmlp_settings["XS"] = \
        [[2, 2], [2, 2], [16, 32], [4, 4], [0.0, 0.0]]
    load_ref("wave_mlp").wavemlp_settings["XS"] = wmod.wavemlp_settings["XS"] = \
        [[1, 1, 1, 1], [2, 2, 2, 2]]
    load_ref("dyna_mlp").dynamlp_settings["XS"] = dmod.dynamlp_settings["XS"] = \
        [[4, 2], [16, 32], [2, 2], [2, 4], 2, 0.0, 2]
    load_ref("sequencer").sequencer_settings["XS"] = smod.sequencer_settings["XS"] = \
        [[1, 1], [16, 32], [8, 8], 2]

    return [
        ("MLP-Mixer", "mlp_mixer", "MLPMixerForImageClassification",
         jm.MLPMixerForImageClassification,
         dict(SMALL, d_model=64, depth=3, expansion_factor=2), 32),
        ("gMLP", "g_mlp", "gMLPForImageClassification",
         jm.gMLPForImageClassification,
         dict(SMALL, d_model=48, d_ffn=96, depth=3), 32),
        ("ResMLP", "res_mlp", "ResMLPForImageClassification",
         jm.ResMLPForImageClassification,
         dict(SMALL, d_model=48, depth=3, expansion_factor=2), 32),
        ("ViP", "vip", "ViP",
         jm.ViP, dict(SMALL, d_model=32, depth=2, segments=4,
                      expansion_factor=2), 32),
        ("S2-MLPv1", "s2_mlp_v1", "S2MLPv1", jm.models.s2_mlp_v1.S2MLPv1,
         dict(image_size=32, patch_size=[4, 2], num_classes=10,
              d_model=[32, 64], depth=[2, 2], expansion_factor=[2, 2]), 32),
        ("S2-MLPv2", "s2_mlp_v2", "S2MLPv2",
         jm.S2MLPv2, dict(image_size=32, patch_size=[4, 2], num_classes=10,
                          d_model=[32, 64], depth=[2, 2],
                          expansion_factor=[2, 2]), 32),
        ("ConvMixer", "conv_mixer", "ConvMixer",
         jm.ConvMixer, dict(dim=32, depth=3, kernel_size=5, patch_size=4,
                            n_classes=10), 32),
        ("ConvMLP", "conv_mlp", "ConvMLP", jm.models.conv_mlp.ConvMLP,
         dict(depth=[1, 2], d_model=[32, 64], expansion_factor=[2, 2],
              channels=16, n_conv_blocks=2, num_classes=10), 64),
        ("RaftMLP", "raft_mlp", "RaftMLP", jm.RaftMLP,
         dict(layers=[{"depth": 1, "dim": 16, "patch_size": 4, "raft_size": 2},
                      {"depth": 1, "dim": 32, "patch_size": 2, "raft_size": 2}],
              image_size=16, num_classes=10), 16),
        ("SparseMLP", "sparse_mlp", "SparseMLP", jm.SparseMLP,
         dict(image_size=32, patch_size=4, num_classes=10, d_model=16,
              depth=[2, 2], expansion_factor=2), 32),
        ("HireMLP", "hire_mlp", "HireMLP", jm.HireMLP,
         dict(patch_size=4, num_classes=10, d_model=[16, 32], h=[4, 3],
              w=[4, 3], cross_region_step=[2, 1], cross_region_interval=2,
              depth=[2, 3], expansion_factor=2), 32),
        ("GFNet", "gfnet", "GFNet", jm.GFNet,
         dict(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
              depth=3), 32),
        ("GFNetPyramid", "gfnet", "GFNetPyramid", jm.GFNetPyramid,
         dict(img_size=32, patch_size=4, num_classes=10,
              embed_dim=[16, 32, 48, 64], depth=[1, 1, 2, 1]), 32),
        ("CycleMLP", "cycle_mlp", "CycleNet", jm.models.cycle_mlp.CycleNet,
         dict(layers=[1, 2], embed_dims=[16, 32], transitions=[True, True],
              mlp_ratios=[2, 2], num_classes=10), 32),
        ("AS-MLP", "as_mlp", "AS_MLP", jm.AS_MLP,
         dict(img_size=32, patch_size=4, num_classes=10, embed_dim=16,
              depths=[2, 2], shift_size=3, drop_path_rate=0.0), 32),
        ("SwinMLP", "swin_mlp", "SwinMLP", jm.SwinMLP,
         dict(img_size=32, patch_size=4, num_classes=10, embed_dim=16,
              depths=[2, 2], num_heads=[2, 4], window_size=4,
              drop_path_rate=0.0), 32),
        ("RepMLPNet", "repmlpnet", "RepMLPNet", jm.models.repmlpnet.RepMLPNet,
         dict(in_channels=3, num_class=10, patch_size=(2, 2),
              num_blocks=(1, 2), channels=(8, 16), hs=(4, 2), ws=(4, 2),
              sharesets_nums=(2, 4), reparam_conv_k=(1, 3)), 16),
        ("WaveMLP", "wave_mlp", "WaveMLP", jm.WaveMLP,
         dict(model_name="XS", num_classes=10), 64),
        ("MS-MLP", "ms_mlp", "MS_MLP", jm.MS_MLP,
         dict(img_size=32, patch_size=4, num_classes=10, embed_dim=16,
              depths=[2, 2], shift_size=3, shift_dist=[-1, 0, 1],
              mix_size=[[1, 3, 5], [1, 3, 3]], drop_path_rate=0.0), 32),
        ("MorphMLP", "morph_mlp", "MorphMLP", jm.MorphMLP,
         dict(model_name="XS", num_classes=10), 32),
        ("DynaMixer", "dyna_mlp", "DynaMixer", jm.DynaMixer,
         dict(model_name="XS", image_size=32, num_classes=10), 32),
        ("ActiveMLP", "active_mlp", "ActiveMLP", jm.models.active_mlp.ActiveMLP,
         dict(depths=[2, 2], embed_dims=[16, 32], mlp_ratios=[2, 2],
              share_dims=[2, 4], intv=2, num_classes=10), 32),
        ("Sequencer2D", "sequencer", "Sequencer2D", jm.Sequencer2D,
         dict(model_name="XS", num_classes=10), 28),
    ]


def main():
    from test_vip_s2mlp import _patch_s2_shifts

    _patch_s2_shifts()
    rows = []
    for name, mod, cls, factory, kwargs, hw in build_cases():
        ref = ref_model(mod, cls, **kwargs)
        ours = factory(**kwargs)
        ours.load_torch_state_dict(ref.state_dict())
        torch.manual_seed(1)
        x = torch.randn(2, 3, hw, hw)
        with torch.no_grad():
            want = ref(x).numpy()
        with config.parity_mode():
            got = np.asarray(ours.eval()(x))
        d = np.abs(got - want)
        rel = d / np.maximum(np.abs(want), 1e-6)
        ok = "yes" if (d.max() < 1e-4 or rel.max() < 1e-4) else "NO"
        rows.append((name, ours.param_count(), d.max(), rel.max(), ok))
        print(f"{name:14s} max abs {d.max():.2e}  max rel {rel.max():.2e}  {ok}")

    with open(os.path.join(REPO, "PARITY.md"), "w") as f:
        f.write("# Forward parity vs the mounted PyTorch reference\n\n")
        f.write("Small configs, CPU fp32, weights imported via "
                "`load_torch_state_dict` (regenerate: `python tools/parity_report.py`).\n")
        f.write("Target: max abs < 1e-4 or max rel < 1e-4 (BASELINE.md).\n\n")
        f.write("| model | params | max abs dev | max rel dev | ≤1e-4 |\n")
        f.write("|---|---|---|---|---|\n")
        for name, n, dmax, rmax, ok in rows:
            f.write(f"| {name} | {n:,} | {dmax:.2e} | {rmax:.2e} | {ok} |\n")
    print("wrote PARITY.md")


if __name__ == "__main__":
    main()
