"""create_model walkthrough — the reference's create_model.ipynb as a script.

The reference notebook (/root/reference/create_model.ipynb, cells 2-11)
builds each model, runs a forward on randn(8, 3, 224, 224), and prints the
output shape, parameter count, and timing. This does the same across the
full factory surface, adding FLOPs from XLA's cost analysis.

Usage:
  python examples/create_model.py                 # every factory, fwd+stats
  python examples/create_model.py --model ViP     # one factory
  python examples/create_model.py --cpu --batch 2 # hermetic / quick
  python examples/create_model.py --time          # add a timed fwd (device)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# every exported factory at its default (paper) config, as in the notebook
FACTORIES = [
    "MLPMixerForImageClassification",
    "gMLPForImageClassification",
    "ResMLPForImageClassification",
    "ViP",
    "S2MLPv1_deep",
    "S2MLPv1_wide",
    "S2MLPv2",
    "ConvMixer",
    "convmlp_s",
    "convmlp_m",
    "convmlp_l",
    "RaftMLP",
    "SparseMLP",
    "HireMLP",
    "GFNet",
    "GFNetPyramid",
    "CycleMLP_B1",
    "CycleMLP_B2",
    "CycleMLP_B3",
    "CycleMLP_B4",
    "CycleMLP_B5",
    "AS_MLP",
    "SwinMLP",
    "create_RepMLPNet_B224",
    "create_RepMLPNet_B256",
    "WaveMLP",
    "MS_MLP",
    "MorphMLP",
    "DynaMixer",
    "ActiveSmall",
    "ActiveBase",
    "ActiveLarge",
    "Sequencer2D",
]

# factories whose defaults need a kwarg to build standalone (same configs the
# notebook passes explicitly)
KWARGS = {
    "gMLPForImageClassification": dict(image_size=224),
    "ViP": dict(patch_size=14, segments=16),
    "ConvMixer": dict(dim=768, depth=32, kernel_size=7, patch_size=7),
    "RaftMLP": dict(layers=[
        {"depth": 2, "dim": 64, "patch_size": 4, "raft_size": 2},
        {"depth": 2, "dim": 128, "patch_size": 2, "raft_size": 2},
    ]),
    "WaveMLP": dict(model_name="T"),
    "MorphMLP": dict(model_name="T"),
    "DynaMixer": dict(model_name="T"),
    "Sequencer2D": dict(model_name="S"),
}

# factories hard-wired to a non-224 resolution
INPUT_SIZE = {"create_RepMLPNet_B256": 256}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="one factory name")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--time", action="store_true",
                    help="also time a jitted forward (scalar-fetch sync)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jittor_mlp_tpu as jm

    names = [args.model] if args.model else FACTORIES
    rng = np.random.default_rng(0)

    def make_input(size):
        return rng.standard_normal(
            (args.batch, 3, size, size)
        ).astype(np.float32)

    print(f"backend: {jax.default_backend()}   batch: {args.batch}")
    header = f"{'factory':34s} {'params':>12s} {'GFLOPs/img':>10s} {'output':>12s}"
    print(header + ("   ms/fwd" if args.time else ""))
    print("-" * len(header))

    failures = 0
    for name in names:
        factory = getattr(jm, name)
        try:
            size = INPUT_SIZE.get(name, args.image_size)
            x = make_input(size)
            model = factory(**KWARGS.get(name, {}))
            out = np.asarray(model(x))
            flops = model.flops((1, 3, size, size))
            line = (f"{name:34s} {model.param_count():>12,} "
                    f"{flops / 1e9:>10.2f} {str(out.shape):>12s}")
            if args.time:
                for _ in range(3):
                    float(np.asarray(model(x)).ravel()[0])  # warmup + sync
                t0 = time.perf_counter()
                n = 10
                for _ in range(n):
                    r = model(x)
                float(np.asarray(r).ravel()[0])
                line += f"   {1e3 * (time.perf_counter() - t0) / n:6.1f}"
            print(line, flush=True)
        except Exception as e:  # keep walking the zoo like the notebook does
            failures += 1
            print(f"{name:34s} ERROR {type(e).__name__}: {e}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
