"""Generate LATENCY.md from latency_sweep.jsonl (+ bench_sweep.jsonl).

The reference benchmarks throughput only (batch 32 FPS, compare.py:22-31);
a serving deployment also cares about small-batch latency. This table
reports steady-state forward latency at batch 1 and batch 8 (bf16, one
v5e, compare.py's scalar-fetch timing protocol: avg of a jitted timed
loop, so it is per-inference latency excluding host preprocessing) next
to the batch-64 throughput point, making the latency↔throughput tradeoff
per family explicit.

Usage:
    python compare.py --all --batch 1 --skip-parity --json latency_sweep.jsonl
    python compare.py --all --batch 8 --skip-parity --json latency_sweep.jsonl
    python tools/latency_table.py
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_by_key(path, key):
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            out[key(r)] = r
    return out


def main():
    lat_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "latency_sweep.jsonl"
    )
    lat = latest_by_key(lat_path, lambda r: (r["model"], r["batch"]))
    bench = latest_by_key(
        os.path.join(ROOT, "bench_sweep.jsonl"), lambda r: r["model"]
    )
    models = sorted({m for (m, _) in lat})
    if not models:
        raise SystemExit(f"no records in {lat_path}")

    have_b8 = any(b == 8 for (_, b) in lat)
    lines = [
        "# LATENCY — zoo-wide small-batch serving latency (one v5e chip, "
        "bf16)",
        "",
        "Steady-state forward latency via compare.py's scalar-fetch timing",
        "protocol (jitted loop average — per-inference device time, no host",
        "preprocessing; the timed window auto-widens until the delta clears",
        "dispatch noise, utils/timing.py). b64 throughput from",
        "bench_sweep.jsonl for the latency↔throughput tradeoff; `b1→b64` is",
        "the throughput ratio (how much of the chip batch-1 serving leaves",
        "on the table). The reference measures batch-32 throughput only",
        "(compare.py:22-31).",
        "",
    ]
    if have_b8:
        lines += [
            "| model | b1 ms/img | b1 img/s | b8 ms/batch | b8 img/s | "
            "b64 img/s | b1→b64 |",
            "|---|---|---|---|---|---|---|",
        ]
    else:
        lines += [
            "| model | b1 ms/img | b1 img/s | b64 img/s | b1→b64 |",
            "|---|---|---|---|---|",
        ]
    for m in models:
        r1 = lat.get((m, 1))
        r8 = lat.get((m, 8))
        b = bench.get(m)
        ms1 = 1000.0 / r1["fps"] if r1 else None
        ms8 = 8000.0 / r8["fps"] if r8 else None
        scal = (b["fps"] / r1["fps"]) if (r1 and b) else None

        def f(v, fmt):
            return fmt.format(v) if v is not None else "—"

        row = (
            f"| {m} | {f(ms1, '{:.2f}')} | "
            f"{f(r1 and r1['fps'], '{:,.0f}')} | "
        )
        if have_b8:
            row += (
                f"{f(ms8, '{:.2f}')} | {f(r8 and r8['fps'], '{:,.0f}')} | "
            )
        row += f"{f(b and b['fps'], '{:,.0f}')} | {f(scal, '{:.1f}×')} |"
        lines.append(row)
    lines.append("")
    out = os.path.join(ROOT, "LATENCY.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out} ({len(models)} models)")


if __name__ == "__main__":
    main()
