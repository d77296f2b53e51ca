"""Regenerate jittor_mlp_tpu/tuned.py from the measured sweeps.

The train sweep (compare.py --all --train --try-remat, merged into
train_sweep.jsonl by tools/merge_train_sweep.py) measures, per driver-size
zoo config, whether block rematerialization beats the plain backward on the
TPU chip and at which batch the best number was taken. The serving sweep
(serving_sweep.jsonl, written by compare.py --serving) measures bf16 and
dynamic-int8 throughput plus their numerics vs the f32 parity forward
(PARITY_BF16.md). This tool bakes both into an importable table so users
get the measured-best settings by default instead of re-deriving them:

    python tools/gen_tuned.py          # rewrites jittor_mlp_tpu/tuned.py

Run after every sweep merge that changes a best-known record.

Serving-dtype rule (measured, not guessed):
- "f32"  when bf16 argmax agreement vs the model's own f32 forward drops
  below 0.90 — numerically degraded default (only s2_mlp_v2: 71.9%, the
  softmax-gate amplification analyzed in PARITY_BF16.md);
- "int8" when dynamic W8A8 is BOTH >=1.05x the bf16 throughput AND keeps
  >=0.98 argmax agreement vs bf16 — int8 loses to bf16 on 21/23 models at
  b256 (quant/dequant is VPU-bound; crossover D~512,
  tools/int8_matmul_curve.py), so it must earn its place per model;
- "bf16" otherwise (the TPU-native serving default).
"""

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HEADER = '''"""Measured best-known train/serve settings per zoo model (GENERATED).

Regenerate with ``python tools/gen_tuned.py`` after updating
train_sweep.jsonl or serving_sweep.jsonl — do not hand-edit the tables.

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

``SERVE`` carries the measured per-model serving recommendation from
serving_sweep.jsonl / PARITY_BF16.md:

- ``dtype``: "bf16" (default), "int8" (dynamic W8A8 — only where it BOTH
  beats bf16 throughput by >=5% and keeps >=98% argmax agreement vs bf16;
  int8 loses to bf16 on 21/23 models, see PARITY_BF16.md), or "f32"
  (numerics guardrail — bf16 argmax agreement vs the model's own f32
  forward < 90%; only s2_mlp_v2, whose softmax gate amplifies bf16
  rounding ~x1.2/block).
- throughput/agreement fields are the measurements behind the call, for
  provenance (img/s at b256, argmax agreement at b64, one v5e chip).

``Predictor`` resolves its default serving dtype through
``serve_settings(name)``; pass ``bf16=``/``compute=`` to override.

``train_settings(name)`` / ``serve_settings(name)`` resolve either a sweep
key ("mlp_mixer") or a factory name ("MLPMixerForImageClassification").
"""

'''

FOOTER = '''

_BY_FACTORY = {rec["factory"]: rec for rec in TRAIN.values()}
_SERVE_BY_FACTORY = {rec["factory"]: rec for rec in SERVE.values()}


def train_settings(name):
    """Best-known train settings for ``name`` (sweep key or factory name).

    Returns a dict with keys ``factory, remat, batch, img_s`` or None when
    the model was never swept (custom configs: measure with
    ``compare.py --model <key> --train --try-remat``).
    """
    return TRAIN.get(name) or _BY_FACTORY.get(name)


def serve_settings(name):
    """Measured serving recommendation for ``name`` (sweep key or factory
    name): dict with ``dtype`` ("bf16"/"int8"/"f32") plus the throughput
    and argmax-agreement measurements behind it, or None when the model
    was never swept (Predictor then defaults to bf16)."""
    return SERVE.get(name) or _SERVE_BY_FACTORY.get(name)
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

    serve = {}
    for line in open(os.path.join(ROOT, "serving_sweep.jsonl")):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        # the file also accumulates serving_bench A/B records ("arm" key)
        if "arm" in r or "fps" not in r or r["model"] not in CONFIGS:
            continue
        bf16_fps, int8_fps = float(r["fps"]), float(r.get("int8_fps", 0.0))
        bf16_agree = float(r.get("bf16_argmax_agree", 1.0))
        int8_vs_bf16 = float(r.get("int8_argmax_agree_vs_bf16", 0.0))
        if bf16_agree < 0.90:
            dtype = "f32"
        elif int8_fps >= 1.05 * bf16_fps and int8_vs_bf16 >= 0.98:
            dtype = "int8"
        else:
            dtype = "bf16"
        _, ref_cls, our_name, _ = CONFIGS[r["model"]]
        serve[r["model"]] = {
            "factory": our_name or ref_cls,
            "dtype": dtype,
            "bf16_img_s": round(bf16_fps, 1),
            "int8_img_s": round(int8_fps, 1),
            "bf16_argmax": round(bf16_agree, 4),
            "int8_argmax": round(float(r.get("int8_argmax_agree", 0.0)), 4),
        }

    lines.append("")
    lines.append("SERVE = {")
    for key in sorted(serve):
        rec = serve[key]
        lines.append(
            f'    "{key}": {{"factory": "{rec["factory"]}", '
            f'"dtype": "{rec["dtype"]}", '
            f'"bf16_img_s": {rec["bf16_img_s"]}, '
            f'"int8_img_s": {rec["int8_img_s"]}, '
            f'"bf16_argmax": {rec["bf16_argmax"]}, '
            f'"int8_argmax": {rec["int8_argmax"]}}},'
        )
    lines.append("}")

    out = os.path.join(ROOT, "jittor_mlp_tpu", "tuned.py")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(lines) + FOOTER)
    n_dt = {d: sum(1 for r in serve.values() if r["dtype"] == d)
            for d in ("bf16", "int8", "f32")}
    print(f"wrote {out}: {len(recs)} train recs "
          f"({sum(r['remat'] for r in recs.values())} remat), "
          f"{len(serve)} serve recs {n_dt}")


if __name__ == "__main__":
    main()
