"""Parity + speed harness — the TPU-native equivalent of the reference's
compare.py (/root/reference/compare.py).

Where the reference builds a model in PyTorch and Jittor, copies weights, and
asserts mean relative error < 1e-3 with an FPS comparison (compare.py:140-186),
this harness builds the torch reference model (CPU) and the jittor_mlp_tpu
model, imports the state_dict, reports max/mean deviation against the ≤1e-4
target, and times the JAX forward with the scalar-fetch sync protocol
(see bench.py for why block_until_ready is insufficient on this runtime).

Usage:
  python compare.py --model mlp_mixer [--batch 32] [--iters 100] [--device tpu]
  python compare.py --list

Note: --device cpu isolates implementation parity (<=1e-6 at full size for
every family spot-checked: sequencer-S 3e-7, AS-MLP 1.2e-6, CycleMLP-B2
4e-7). With --device tpu, deep norm/recurrence-heavy models accumulate TPU
fp32 numerics drift (rsqrt/transcendental approximations, reduction order):
~6e-4 CycleMLP-B2, ~1e-3 sequencer-S, ~6e-3 AS-MLP — hardware numerics, not
implementation deviation.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "tests")

# model name -> (ref module, ref class, our factory name, kwargs) using the
# reference harness's benchmark configs (compare.py:35-138) scaled as given.
CONFIGS = {
    "mlp_mixer": ("mlp_mixer", "MLPMixerForImageClassification",
                  "MLPMixerForImageClassification",
                  dict(image_size=224, patch_size=16, d_model=256, depth=12)),
    "g_mlp": ("g_mlp", "gMLPForImageClassification", "gMLPForImageClassification",
              dict(image_size=224, patch_size=16, d_model=256, d_ffn=1536, depth=30)),
    "res_mlp": ("res_mlp", "ResMLPForImageClassification",
                "ResMLPForImageClassification",
                dict(image_size=224, patch_size=16, d_model=384, depth=12)),
    "vip": ("vip", "ViP", "ViP",
            dict(image_size=224, patch_size=14, d_model=256, depth=30, segments=16,
                 weighted=True)),
    "conv_mixer": ("conv_mixer", "ConvMixer", "ConvMixer",
                   dict(dim=1568, depth=20, kernel_size=9, patch_size=14)),
    "s2_mlp_v2": ("s2_mlp_v2", "S2MLPv2", "S2MLPv2",
                  dict(image_size=224, patch_size=[7, 2], d_model=[192, 384],
                       depth=[4, 14], expansion_factor=[3, 3])),
    "sparse_mlp": ("sparse_mlp", "SparseMLP", "SparseMLP", dict()),
    "hire_mlp": ("hire_mlp", "HireMLP", "HireMLP", dict()),
    "gfnet": ("gfnet", "GFNet", "GFNet", dict()),
    "cycle_mlp": ("cycle_mlp", "CycleMLP_B2", "CycleMLP_B2", dict()),
    "as_mlp": ("as_mlp", "AS_MLP", "AS_MLP", dict()),
    "swin_mlp": ("swin_mlp", "SwinMLP", "SwinMLP", dict(drop_path_rate=0.0)),
    "repmlpnet": ("repmlpnet", "create_RepMLPNet_B224", "create_RepMLPNet_B224", dict()),
    "wave_mlp": ("wave_mlp", "WaveMLP", "WaveMLP", dict(model_name="T")),
    "ms_mlp": ("ms_mlp", "MS_MLP", "MS_MLP", dict(drop_path_rate=0.0)),
    "morph_mlp": ("morph_mlp", "MorphMLP", "MorphMLP", dict(model_name="T")),
    "dyna_mlp": ("dyna_mlp", "DynaMixer", "DynaMixer", dict(model_name="T")),
    "sequencer": ("sequencer", "Sequencer2D", "Sequencer2D", dict(model_name="S")),
    "active_mlp": ("active_mlp", "ActivexTiny", None, dict()),
    "s2_mlp_v1": ("s2_mlp_v1", "S2MLPv1_wide", "S2MLPv1_wide", dict()),
    "conv_mlp": ("conv_mlp", "convmlp_s", "convmlp_s", dict()),
    "raft_mlp": ("raft_mlp", "RaftMLP", "RaftMLP",
                 dict(layers=[
                     {"depth": 2, "dim": 64, "patch_size": 4, "raft_size": 2},
                     {"depth": 2, "dim": 128, "patch_size": 2, "raft_size": 2},
                 ])),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mlp_mixer")
    ap.add_argument("--all", action="store_true", help="run every config")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--device", choices=["tpu", "cpu"], default="tpu")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    if args.list:
        print("\n".join(sorted(CONFIGS)))
        return

    if args.all:
        import subprocess

        base = [a for a in sys.argv[1:] if a != "--all" and not a.startswith("--model")]
        for name in sorted(CONFIGS):
            subprocess.run([sys.executable, __file__, "--model", name, *base])
        return

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu import config

    config.enable_compile_cache()

    ref_mod, ref_cls, our_name, kwargs = CONFIGS[args.model]
    import torch

    from ref_loader import ref_model

    print(f"== {args.model} ==")
    ours_factory = getattr(jm, our_name) if our_name else getattr(
        jm.models.active_mlp, ref_cls
    )
    ours = ours_factory(**kwargs)
    print(f"params: {ours.param_count():,}")

    if not args.skip_parity:
        if args.model in ("s2_mlp_v1", "s2_mlp_v2"):
            # torch-CPU cascades on the reference's overlapping in-place
            # shifts (UB); patch in the functional semantics the original
            # CUDA/Jittor parity harness validated (tests/test_vip_s2mlp.py)
            from test_vip_s2mlp import _patch_s2_shifts

            _patch_s2_shifts()
        ref = ref_model(ref_mod, ref_cls, **kwargs)
        ours.load_torch_state_dict(ref.state_dict())
        x = torch.randn(2, 3, args.image_size, args.image_size)
        with torch.no_grad():
            t0 = time.perf_counter()
            want = ref(x).numpy()
            t_ref = time.perf_counter() - t0
        with config.parity_mode():
            got = np.asarray(ours(x))
        diff = np.abs(got - want)
        rel = diff / np.maximum(np.abs(want), 1e-6)
        # the reference's own acceptance metric: mean relative error on
        # outputs+1 < 1e-3 (compare.py:179-186). Only allowed to relax the
        # strict max-abs/max-rel gate when random-init outputs are at a
        # degenerate scale (BN-heavy models reach |out| ~ 1e5, where absolute
        # float error is meaningless) — otherwise a localized corruption
        # could hide inside a mean.
        ref_rel = float(np.mean(np.abs(got - want)
                                / np.maximum(np.abs(want + 1), 1e-6)))
        degenerate_scale = float(np.abs(want).max()) > 100.0
        ok = (diff.max() < 1e-4 or rel.max() < 1e-4
              or (degenerate_scale and ref_rel < 1e-3))
        status = "OK" if ok else "FAIL"
        print(f"parity: max abs {diff.max():.3e}  mean abs {diff.mean():.3e}  "
              f"max rel {rel.max():.3e}  ref-mean-rel {ref_rel:.3e}  "
              f"[{status}]  (torch cpu fwd {t_ref*1e3:.0f} ms)")

    # throughput: shared scalar-fetch protocol (utils/timing.py)
    from jittor_mlp_tpu.utils.timing import throughput

    ours.to_bf16()
    with config.bf16_mode():
        fps = throughput(
            ours.apply, ours.params,
            (args.batch, 3, args.image_size, args.image_size),
            iters=args.iters,
        )
    print(f"throughput: {fps:,.0f} images/sec (batch {args.batch}, "
          f"{args.iters} iters, {jax.default_backend()})")


if __name__ == "__main__":
    main()
