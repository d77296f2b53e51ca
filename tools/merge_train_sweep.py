"""Merge a --train --try-remat resweep into train_sweep.jsonl.

Keeps the existing record when the resweep lacks the model or measured
slower (run-to-run noise must not regress the recorded best-known number
without cause); replaces it when the resweep is faster or changes the
remat flag with a faster result.

    python tools/merge_train_sweep.py /tmp/train_resweep.jsonl
"""

import json
import sys


def main():
    new_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_resweep.jsonl"
    old = {r["model"]: r for r in
           (json.loads(l) for l in open("train_sweep.jsonl") if l.strip())}
    for line in open(new_path):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if "train_fps" not in r:
            continue
        prev = old.get(r["model"])
        keep = {k: v for k, v in r.items()
                if k in ("model", "train_fps", "train_batch", "train_remat")}
        if prev is None or keep["train_fps"] > prev.get("train_fps", 0):
            delta = (keep["train_fps"] / prev["train_fps"] - 1
                     if prev and prev.get("train_fps") else float("nan"))
            print(f"{r['model']:12s} {prev.get('train_fps', 0) if prev else 0:8.0f}"
                  f" -> {keep['train_fps']:8.0f}  ({delta:+.0%})"
                  f"{' remat' if keep.get('train_remat') else ''}")
            old[r["model"]] = {**(prev or {}), **keep}
        else:
            print(f"{r['model']:12s} kept {prev['train_fps']:,.0f} "
                  f"(resweep {keep['train_fps']:,.0f})")
    with open("train_sweep.jsonl", "w") as f:
        for name in sorted(old):
            f.write(json.dumps(old[name]) + "\n")


if __name__ == "__main__":
    main()
