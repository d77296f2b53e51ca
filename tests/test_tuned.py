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
from jittor_mlp_tpu.tuned import TRAIN, train_settings  # noqa: E402


def test_covers_whole_sweep():
    swept = set()
    for line in open(os.path.join(ROOT, "train_sweep.jsonl")):
        if line.strip():
            swept.add(json.loads(line)["model"])
    assert set(TRAIN) == swept


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
