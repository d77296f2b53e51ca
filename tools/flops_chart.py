"""Render imgs/throughput_flops.png: measured v5e throughput vs forward
GFLOPs/img for the whole zoo — the rebuild's counterpart of the reference's
imgs/FLOPs.png figure (README.md:4). Reads bench_sweep.jsonl (throughput) and
computes FLOPs from XLA cost analysis on CPU.

Usage: python tools/flops_chart.py [bench_sweep.jsonl]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests"),
    )
    import compare

    path = sys.argv[1] if len(sys.argv) > 1 else "bench_sweep.jsonl"
    fps = {}
    for line in open(path):
        r = json.loads(line)
        if "fps" in r:
            fps[r["model"]] = r["fps"]

    rows = []
    for name, v in sorted(fps.items()):
        try:
            m = compare.build_ours(name)
            size = 224
            gf = m.flops((1, 3, size, size)) / 1e9
            rows.append((name, gf, v))
            print(f"{name:12s} {gf:7.2f} GF  {v:6,} img/s", flush=True)
        except Exception as e:
            print(f"{name}: skipped ({type(e).__name__}: {e})", flush=True)

    # single series → one neutral data hue, direct labels, no legend
    ink, muted, accent = "#1a1a1a", "#767676", "#4e79a7"
    fig, ax = plt.subplots(figsize=(9, 6), dpi=150)
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    ax.scatter(xs, ys, s=42, color=accent, zorder=3)
    # stagger labels of near-coincident points (log-space proximity)
    import math

    placed = []
    for name, x, y in rows:
        dy = 4
        for px, py in placed:
            if (abs(math.log10(x) - math.log10(px)) < 0.06
                    and abs(math.log10(y) - math.log10(py)) < 0.035):
                dy = -11
        placed.append((x, y))
        ax.annotate(name, (x, y), textcoords="offset points",
                    xytext=(6, dy), fontsize=7.5, color=ink)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("forward GFLOPs / image (XLA cost analysis, 224²)",
                  color=ink)
    ax.set_ylabel("images / sec (v5e chip, bf16, batch 64)", color=ink)
    ax.set_title("jittor_mlp_tpu zoo: measured TPU throughput vs FLOPs",
                 color=ink, fontsize=11)
    ax.grid(True, which="both", linewidth=0.4, color="#e3e3e3", zorder=0)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(muted)
    ax.tick_params(colors=muted)
    os.makedirs("imgs", exist_ok=True)
    fig.tight_layout()
    fig.savefig("imgs/throughput_flops.png")
    print("wrote imgs/throughput_flops.png")


if __name__ == "__main__":
    main()
