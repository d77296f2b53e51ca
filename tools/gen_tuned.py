"""Regenerate jittor_mlp_tpu/tuned.py from the measured train sweep.

The train sweep (compare.py --all --train --try-remat, merged into
train_sweep.jsonl by tools/merge_train_sweep.py) measures, per driver-size
zoo config, whether block rematerialization beats the plain backward on the
TPU chip and at which batch the best number was taken. This tool bakes the
result into an importable table so users get the measured-best settings by
default instead of re-deriving them per run:

    python tools/gen_tuned.py          # rewrites jittor_mlp_tpu/tuned.py

Run after every sweep merge that changes a best-known record.
"""

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HEADER = '''"""Measured best-known training settings per zoo model (GENERATED).

Regenerate with ``python tools/gen_tuned.py`` after updating
train_sweep.jsonl — do not hand-edit the table.

Each record comes from an on-chip measurement of the full driver-size
config (compare.py CONFIGS) with mixed-precision (bf16 compute, f32
masters) training:

- ``remat``: whether block rematerialization (jax.checkpoint around every
  scanned block) beat the plain backward.  On TPU this is frequently a
  THROUGHPUT optimization, not only a memory one: when a model's stored
  forward intermediates have TPU-hostile layouts, the backward spends more
  time relaying them out of HBM than recomputing them costs (measured up
  to 2.4x on as_mlp — docs/PERFORMANCE.md).
- ``batch``: per-chip batch the best number was measured at.
- ``img_s``: the measured mixed-precision training throughput, img/s on a
  single v5e chip, for provenance.

``train_settings(name)`` resolves either a sweep key ("mlp_mixer") or a
factory name ("MLPMixerForImageClassification").
"""

'''

FOOTER = '''

_BY_FACTORY = {rec["factory"]: rec for rec in TRAIN.values()}


def train_settings(name):
    """Best-known train settings for ``name`` (sweep key or factory name).

    Returns a dict with keys ``factory, remat, batch, img_s`` or None when
    the model was never swept (custom configs: measure with
    ``compare.py --model <key> --train --try-remat``).
    """
    return TRAIN.get(name) or _BY_FACTORY.get(name)
'''


def main():
    from compare import CONFIGS

    sweep_path = os.path.join(ROOT, "train_sweep.jsonl")
    recs = {}
    for line in open(sweep_path):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if "train_fps" not in r:
            continue
        key = r["model"]
        ref_mod, ref_cls, our_name, _ = CONFIGS[key]
        recs[key] = {
            "factory": our_name or ref_cls,
            "remat": bool(r.get("train_remat", False)),
            "batch": int(r.get("train_batch", 32)),
            "img_s": round(float(r["train_fps"]), 1),
        }

    lines = ["TRAIN = {"]
    for key in sorted(recs):
        rec = recs[key]
        lines.append(
            f'    "{key}": {{"factory": "{rec["factory"]}", '
            f'"remat": {rec["remat"]}, "batch": {rec["batch"]}, '
            f'"img_s": {rec["img_s"]}}},'
        )
    lines.append("}")

    out = os.path.join(ROOT, "jittor_mlp_tpu", "tuned.py")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(lines) + FOOTER)
    print(f"wrote {out}: {len(recs)} models, "
          f"{sum(r['remat'] for r in recs.values())} remat")


if __name__ == "__main__":
    main()
