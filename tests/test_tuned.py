"""The generated tuned-settings table stays in sync with the sweep artifact.

jittor_mlp_tpu/tuned.py is generated from train_sweep.jsonl by
tools/gen_tuned.py; these tests pin (a) full zoo coverage, (b) that every
factory name in the table resolves, and (c) that the checked-in module
matches a fresh regeneration from the artifact (no silent drift).
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

import jittor_mlp_tpu as jm  # noqa: E402
from jittor_mlp_tpu.tuned import (  # noqa: E402
    SERVE, TRAIN, serve_settings, train_settings,
)


def test_covers_whole_sweep():
    swept = set()
    for line in open(os.path.join(ROOT, "train_sweep.jsonl")):
        if line.strip():
            swept.add(json.loads(line)["model"])
    assert set(TRAIN) == swept


def test_serve_covers_whole_serving_sweep():
    swept = set()
    for line in open(os.path.join(ROOT, "serving_sweep.jsonl")):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if "arm" not in r and "fps" in r:  # skip serving_bench A/B records
            swept.add(r["model"])
    assert set(SERVE) == swept


def test_serve_dtype_recommendations():
    """The measured serving-dtype calls (PARITY_BF16.md): s2_mlp_v2 is the
    numerics guardrail (f32), mlp_mixer the only model where dynamic int8
    earns its place, everything else bf16."""
    assert SERVE["s2_mlp_v2"]["dtype"] == "f32"
    assert SERVE["mlp_mixer"]["dtype"] == "int8"
    assert SERVE["dyna_mlp"]["dtype"] == "bf16"
    for key, rec in SERVE.items():
        assert rec["dtype"] in ("bf16", "int8", "f32"), key
        assert rec["bf16_img_s"] > 0 and 0 <= rec["bf16_argmax"] <= 1, key
    assert serve_settings("s2_mlp_v2") is serve_settings("S2MLPv2")
    assert serve_settings("no_such_model") is None


def test_factories_resolve_and_records_typed():
    for key, rec in TRAIN.items():
        factory = getattr(jm, rec["factory"], None) or getattr(
            jm.models.active_mlp, rec["factory"], None
        )
        assert callable(factory), (key, rec["factory"])
        assert isinstance(rec["remat"], bool)
        assert rec["batch"] >= 1 and rec["img_s"] > 0


def test_lookup_by_key_and_factory():
    assert train_settings("mlp_mixer") is train_settings(
        "MLPMixerForImageClassification"
    )
    assert train_settings("no_such_model") is None


def test_generated_module_in_sync_with_artifact(tmp_path):
    src = os.path.join(ROOT, "jittor_mlp_tpu", "tuned.py")
    before = open(src).read()
    subprocess.run([sys.executable, os.path.join(ROOT, "tools", "gen_tuned.py")],
                   check=True, capture_output=True)
    after = open(src).read()
    if before != after:  # restore, then fail loudly
        open(src, "w").write(before)
        raise AssertionError(
            "jittor_mlp_tpu/tuned.py is stale — rerun tools/gen_tuned.py "
            "after changing train_sweep.jsonl"
        )
