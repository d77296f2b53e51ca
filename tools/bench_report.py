"""Regenerate BENCHMARKS.md from a bench_sweep.jsonl produced by either
`compare.py --all --skip-parity --json bench_sweep.jsonl` or the incremental
per-model sweep. Usage: python tools/bench_report.py [bench_sweep.jsonl]
"""

import json
import os
import sys

NOTES = {
    "conv_mixer": "VPU-roofline-bound: the k7 depthwise conv is 2.47 GF/img "
                  "of VPU work (measured 5.5 T-MAC/s ≈ XLA's roofline); "
                  "Mosaic blocks in-kernel sublane shifts, so a fused Pallas "
                  "dw kernel cannot beat it (see BENCHMARKS notes)",
    "dyna_mlp": "the W-length attention contraction (71% of fwd as 16k tiny "
                "batched matmuls at 0.13 TF/s) unrolls into VPU "
                "broadcast-FMAs at batch ≥ 64 (1,338 → 1,902; 3,514 at "
                "b128); training unrolls from b128 through a custom VJP "
                "whose backward stays on the VPU (350 → 520 img/s — below "
                "b128 the backward's W-term stacks dominate and the einsum "
                "keeps b32 at 391); small-batch/f32 keep the einsum — six "
                "other formulations incl. a Pallas kernel measured slower "
                "(docs/PERFORMANCE.md, tools/dyna_probe.py)",
    "active_mlp": "learned float offsets: dense hat-function bilinear "
                  "contraction (85× over gather lowering; 15 GF/img vs "
                  "CycleMLP's 2.4); opt-in `offset_band=D` sampler: fwd "
                  "3,329 / train 1,242 at D=2, exact while offsets stay in "
                  "band (docs/PERFORMANCE.md)",
    "as_mlp": "analytic GroupNorm custom VJP on the bf16 train path (saves "
              "x-hat + per-group rsqrt instead of XLA's autodiff residuals): "
              "train 1,434 → 1,472 img/s",
    "repmlpnet": "Local-Perceptron repconv as a full-C tiled depthwise conv "
                 "(the reference's grouped layout uses S=1..128 in-channels "
                 "= 1/128 lanes at stage 0): fwd 3,598 → 5,327; train under "
                 "remat (docs/PERFORMANCE.md tail anatomy): 344 → 997",
    "hire_mlp": "inner-region transposes folded into the FF contractions "
                "(dot_general over the joint (C, region) axes): 1,489 → "
                "3,229 img/s; train under remat 437 → 688",
    "gfnet_h_b": "rfft2/irfft2 factored into per-axis DFT matmuls on the MXU "
                 "(XLA's TPU FFT is 6.5–10× slower at the 56²/28² stages): "
                 "1,461 → 3,689 img/s",
    "gfnet": "global filter as separable DFT matmuls (tools/gfnet_profile.py)"
             ": 3,063 → 4,800 img/s",
    "swin_mlp": "window partition/reverse folded into the grouped spatial "
                "matmul as one 6D einsum (tools/swin_probe.py): 3,347 → "
                "5,997 img/s",
    "mlp_mixer": "fused Pallas block; 6,269 img/s at the driver's batch 256 "
                 "(bench.py)",
    "sparse_mlp": "sMLP fuse 1×1 over `cat([x_h,x_w,x])` split into three "
                  "d→d matmuls at d≥192 stages — the 3d-channel concat never "
                  "materializes (tools/sparse_probe.py: 2.4×/1.4×/2.7× on "
                  "the sub-block): fwd 3,943 → 4,197, train 820 → 858",
    "wave_mlp": "tfc group-of-2 grouped conv split into two full-C depthwise "
                "convs (even/odd channel streams; 2/128 → full lanes): fwd "
                "3,632 → 4,394, train 523 → 1,040 (tools/wave_probe.py)",
    "vip": "SplitAttention gate/output computed on the unstacked branches — "
           "no (B,k,H,W,C) HBM buffer (models/vip.py): fwd 4,754 → 5,047 at "
           "b64 (7,625 at b256), train 819 → 862 (tools/vip_probe.py)",
}


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_sweep.jsonl"
    recs = {}
    for line in open(path):
        r = json.loads(line)
        recs[r["model"]] = r  # last write wins
    rows = sorted(recs.values(), key=lambda r: r["model"])

    # optional training sweep (compare.py --train --json train_sweep.jsonl),
    # expected next to the main sweep file
    train = {}
    tpath = os.path.join(os.path.dirname(os.path.abspath(path)),
                         "train_sweep.jsonl")
    try:
        for line in open(tpath):
            r = json.loads(line)
            train[r["model"]] = r
    except FileNotFoundError:
        pass

    # --skip-parity sweep records carry no param count; build on CPU to fill
    if any("params" not in r for r in rows if "error" not in r):
        import jax

        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, ".")
        import compare

        for r in rows:
            if "error" not in r and "params" not in r:
                r["params"] = compare.build_ours(r["model"]).param_count()

    out = [
        "# On-chip benchmarks (single v5e, bf16, batch 64, compare.py configs)",
        "",
        "Throughput via the scalar-fetch protocol (`utils/timing.py`);",
        "parity for every config is the strict full-size CPU gate",
        "(`pytest -m slow`, all ≤1e-4 — see PARITY.md for the tiny-config",
        "table). Regenerate: `python compare.py --all --skip-parity --json",
        "bench_sweep.jsonl && python tools/bench_report.py`.",
        "",
        "| model | params | images/sec | train img/s (mixed, b32) | notes |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        if "error" in r:
            out.append(f"| {r['model']} | — | ERROR | — | {r['error']} |")
            continue
        note = NOTES.get(r["model"], "")
        t = train.get(r["model"], {})
        if "train_fps" in t:
            tags = []
            if t.get("train_remat"):
                tags.append("remat")
            if t.get("train_batch", 32) != 32:
                tags.append(f"b{t['train_batch']}")
            tcell = f"{t['train_fps']:,.0f}" + (
                f" ({', '.join(tags)})" if tags else "")
        else:
            tcell = "ERR" if "train_error" in t else "—"
        out.append(
            f"| {r['model']} | {r['params']:,} | {r['fps']:,.0f} "
            f"| {tcell} | {note} |"
        )
    out += [
        "",
        "Training step (full fwd+bwd+adamw, Mixer-B/16 @224 b128, one v5e;",
        "`tools/train_bench.py`): 776 img/s f32 with block remat (the",
        "no-remat backward needs 25.6 GB > 15.75 GB HBM); 1,432 img/s mixed",
        "precision (f32 master weights/grads/optimizer, bf16 compute via",
        "`make_train_step(compute_dtype=bf16)`); 1,456 img/s pure bf16 —",
        "mixed costs ~2% over bf16 and keeps f32 update numerics. The bf16",
        "backward differentiates the same hardware-tanh GELU the fused",
        "forward computes (was exact-erf: +35% train throughput).",
        "",
        "Serving-precision numerics (bf16 default and dynamic-W8A8 int8) are",
        "tabulated zoo-wide in PARITY_BF16.md (generated by",
        "tools/serving_table.py from serving_sweep.jsonl, b256 on-chip).",
        "",
        "Models under ~2k img/s are at measured architectural rooflines, not",
        "missing optimization — each note states the binding limit; the",
        "ConvMixer analysis in full: the depthwise k7 conv is VPU work",
        "(no MXU path exists for per-channel spatial taps), measured at",
        "0.894 ms/layer ≈ the 5.5 T-MAC/s VPU roofline, epilogues fully",
        "fused (gelu+BN+residual ride the producing matmul/one pass),",
        "pointwise convs run as matmuls at ~184 TFLOPS. A Pallas fused",
        "block was prototyped and rejected: Mosaic on this toolchain",
        "cannot express in-kernel sublane shifts (`pltpu.roll`/pad/slice",
        "all crash the remote compiler), and a roll+mask formulation costs",
        "3 VPU ops per tap vs XLA's ~2.",
        "",
    ]
    with open("BENCHMARKS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote BENCHMARKS.md ({len(rows)} models)")


if __name__ == "__main__":
    main()
