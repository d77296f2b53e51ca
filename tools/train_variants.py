"""Mixer-B/16 train-step scheme shootout on the local chip.

Measures the same protocol as tools/train_bench.py (N adamw steps in one
jitted fori_loop, t(N)-t(1)) across the three backward schemes:

  pallas_bwd   — fused Pallas forward AND fused Pallas backward
                 (ops/pallas/mixer_block_bwd.py: token bwd + channel data
                 bwd + channel weight bwd kernels);
  recompute    — round-2 scheme: fused Pallas forward, backward = XLA VJP
                 of the plain jnp block (re-runs the whole block forward
                 in XLA at backward time);
  plain_xla    — no Pallas anywhere: XLA forward + XLA backward with
                 stored residuals.

Usage: python tools/train_variants.py [--batch 128] [--iters 10]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from train_bench import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="mixed", choices=["mixed", "bf16"])
    args = ap.parse_args()

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu import config

    config.enable_compile_cache()

    for scheme in ("pallas_bwd", "recompute", "plain_xla"):
        config.pallas_bwd = scheme == "pallas_bwd"
        model = jm.MLPMixerForImageClassification(
            d_model=768, depth=12, token_dim=384,
            use_pallas=scheme != "plain_xla",
        )
        if args.dtype == "bf16":
            model.to_bf16()
        with config.bf16_mode():
            fps = measure(model, args.batch, args.dtype, args.iters)
        print(json.dumps({
            "metric": f"mixer_b16_224_train_{args.dtype}_{scheme}",
            "value": round(fps, 1),
            "unit": "images/sec/chip",
            "batch": args.batch,
        }), flush=True)


if __name__ == "__main__":
    main()
