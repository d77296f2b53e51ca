"""Render a compare.py --json parity sweep into a markdown artifact.

    python compare.py --all --skip-throughput --device cpu --json parity_full.jsonl
    python tools/parity_table.py parity_full.jsonl PARITY_FULL.md \
        --title "Full-size strict parity (CPU f32)"

Makes the per-round strict-parity run diffable in-repo instead of
re-derivable only by a 30-minute rerun (VERDICT r2 items 1 & 6).
"""

import argparse
import json
import sys


def render(records, title, note=""):
    lines = [f"# {title}", ""]
    if note:
        lines += [note, ""]
    lines += [
        "| model | params | max abs | mean abs | max rel | ref mean-rel "
        "(<1e-3 gate) | out scale | BN recal | ≤1e-4 |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in sorted(records, key=lambda r: r["model"]):
        lines.append(
            "| {model} | {params:,} | {max_abs:.2e} | {mean_abs:.2e} | "
            "{max_rel:.2e} | {ref_mean_rel:.2e} | {out_scale:.1e} | "
            "{bn} | {ok} |".format(
                model=r["model"], params=r.get("params", 0),
                max_abs=r["max_abs"], mean_abs=r["mean_abs"],
                max_rel=r["max_rel"], ref_mean_rel=r["ref_mean_rel"],
                out_scale=r["out_scale"],
                bn="yes" if r.get("bn_recalibrated") else "—",
                ok="**yes**" if r.get("parity_ok") else "no",
            )
        )
    n_ok = sum(bool(r.get("parity_ok")) for r in records)
    lines += ["", f"{n_ok}/{len(records)} configs meet the strict "
                  f"max-abs-or-max-rel ≤ 1e-4 gate."]
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("out_md")
    ap.add_argument("--title", default="Full-size parity sweep")
    ap.add_argument("--note", default="")
    args = ap.parse_args()
    records = []
    with open(args.jsonl) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    if not records:
        sys.exit("no records")
    with open(args.out_md, "w") as f:
        f.write(render(records, args.title, args.note))
    print(f"wrote {args.out_md} ({len(records)} models)")


if __name__ == "__main__":
    main()
