"""Measured best-known train/serve settings per zoo model (GENERATED).

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

TRAIN = {
    "active_mlp": {"factory": "ActivexTiny", "remat": False, "batch": 32, "img_s": 475.6},
    "as_mlp": {"factory": "AS_MLP", "remat": True, "batch": 32, "img_s": 1472.4},
    "conv_mixer": {"factory": "ConvMixer", "remat": True, "batch": 32, "img_s": 233.4},
    "conv_mlp": {"factory": "convmlp_m", "remat": True, "batch": 32, "img_s": 1866.4},
    "cycle_mlp": {"factory": "CycleMLP_B2", "remat": True, "batch": 32, "img_s": 1615.4},
    "dyna_mlp": {"factory": "DynaMixer", "remat": True, "batch": 128, "img_s": 519.0},
    "g_mlp": {"factory": "gMLPForImageClassification", "remat": True, "batch": 32, "img_s": 1308.8},
    "gfnet": {"factory": "GFNet", "remat": True, "batch": 32, "img_s": 1152.4},
    "gfnet_h_b": {"factory": "GFNetPyramid", "remat": True, "batch": 32, "img_s": 868.5},
    "hire_mlp": {"factory": "HireMLP", "remat": True, "batch": 32, "img_s": 688.3},
    "mlp_mixer": {"factory": "MLPMixerForImageClassification", "remat": False, "batch": 32, "img_s": 1159.6},
    "morph_mlp": {"factory": "MorphMLP", "remat": True, "batch": 32, "img_s": 2060.2},
    "ms_mlp": {"factory": "MS_MLP", "remat": True, "batch": 32, "img_s": 1019.5},
    "raft_mlp": {"factory": "RaftMLP", "remat": False, "batch": 32, "img_s": 1704.1},
    "repmlpnet": {"factory": "create_RepMLPNet_B224", "remat": True, "batch": 64, "img_s": 997.0},
    "res_mlp": {"factory": "ResMLPForImageClassification", "remat": False, "batch": 32, "img_s": 2900.5},
    "s2_mlp_v1": {"factory": "S2MLPv1_wide", "remat": True, "batch": 32, "img_s": 1317.8},
    "s2_mlp_v2": {"factory": "S2MLPv2", "remat": True, "batch": 32, "img_s": 1430.8},
    "sequencer": {"factory": "Sequencer2D", "remat": True, "batch": 32, "img_s": 1054.8},
    "sparse_mlp": {"factory": "SparseMLP", "remat": True, "batch": 32, "img_s": 857.7},
    "swin_mlp": {"factory": "SwinMLP", "remat": True, "batch": 32, "img_s": 1558.8},
    "vip": {"factory": "ViP", "remat": True, "batch": 32, "img_s": 862.1},
    "wave_mlp": {"factory": "WaveMLP", "remat": True, "batch": 32, "img_s": 1039.7},
}

SERVE = {
    "active_mlp": {"factory": "ActivexTiny", "dtype": "bf16", "bf16_img_s": 1546.9, "int8_img_s": 1487.8, "bf16_argmax": 1.0, "int8_argmax": 1.0},
    "as_mlp": {"factory": "AS_MLP", "dtype": "bf16", "bf16_img_s": 6320.7, "int8_img_s": 4690.7, "bf16_argmax": 1.0, "int8_argmax": 0.9688},
    "conv_mixer": {"factory": "ConvMixer", "dtype": "bf16", "bf16_img_s": 1204.7, "int8_img_s": 977.8, "bf16_argmax": 1.0, "int8_argmax": 1.0},
    "conv_mlp": {"factory": "convmlp_m", "dtype": "bf16", "bf16_img_s": 15512.3, "int8_img_s": 9325.6, "bf16_argmax": 0.9688, "int8_argmax": 0.9531},
    "cycle_mlp": {"factory": "CycleMLP_B2", "dtype": "bf16", "bf16_img_s": 7625.8, "int8_img_s": 5709.0, "bf16_argmax": 0.9844, "int8_argmax": 0.9688},
    "dyna_mlp": {"factory": "DynaMixer", "dtype": "bf16", "bf16_img_s": 2683.9, "int8_img_s": 968.4, "bf16_argmax": 0.9688, "int8_argmax": 0.9531},
    "g_mlp": {"factory": "gMLPForImageClassification", "dtype": "bf16", "bf16_img_s": 7493.3, "int8_img_s": 6290.9, "bf16_argmax": 0.9844, "int8_argmax": 0.9688},
    "gfnet": {"factory": "GFNet", "dtype": "bf16", "bf16_img_s": 3821.6, "int8_img_s": 3768.7, "bf16_argmax": 1.0, "int8_argmax": 0.9844},
    "gfnet_h_b": {"factory": "GFNetPyramid", "dtype": "bf16", "bf16_img_s": 3100.9, "int8_img_s": 2290.5, "bf16_argmax": 1.0, "int8_argmax": 0.9844},
    "hire_mlp": {"factory": "HireMLP", "dtype": "bf16", "bf16_img_s": 4679.8, "int8_img_s": 3410.0, "bf16_argmax": 0.9688, "int8_argmax": 0.9531},
    "mlp_mixer": {"factory": "MLPMixerForImageClassification", "dtype": "int8", "bf16_img_s": 5485.8, "int8_img_s": 6427.3, "bf16_argmax": 1.0, "int8_argmax": 1.0},
    "morph_mlp": {"factory": "MorphMLP", "dtype": "bf16", "bf16_img_s": 9952.8, "int8_img_s": 6483.6, "bf16_argmax": 1.0, "int8_argmax": 0.9844},
    "ms_mlp": {"factory": "MS_MLP", "dtype": "bf16", "bf16_img_s": 8226.2, "int8_img_s": 5741.6, "bf16_argmax": 0.9844, "int8_argmax": 0.9531},
    "raft_mlp": {"factory": "RaftMLP", "dtype": "bf16", "bf16_img_s": 12598.0, "int8_img_s": 6837.6, "bf16_argmax": 0.9531, "int8_argmax": 0.8906},
    "repmlpnet": {"factory": "create_RepMLPNet_B224", "dtype": "bf16", "bf16_img_s": 4835.3, "int8_img_s": 4054.7, "bf16_argmax": 0.9844, "int8_argmax": 0.9844},
    "res_mlp": {"factory": "ResMLPForImageClassification", "dtype": "bf16", "bf16_img_s": 14082.4, "int8_img_s": 14222.9, "bf16_argmax": 1.0, "int8_argmax": 0.9844},
    "s2_mlp_v1": {"factory": "S2MLPv1_wide", "dtype": "bf16", "bf16_img_s": 5311.0, "int8_img_s": 5281.9, "bf16_argmax": 1.0, "int8_argmax": 1.0},
    "s2_mlp_v2": {"factory": "S2MLPv2", "dtype": "f32", "bf16_img_s": 5597.0, "int8_img_s": 4051.1, "bf16_argmax": 0.7188, "int8_argmax": 0.4531},
    "sequencer": {"factory": "Sequencer2D", "dtype": "bf16", "bf16_img_s": 4063.5, "int8_img_s": 3333.0, "bf16_argmax": 1.0, "int8_argmax": 0.9531},
    "sparse_mlp": {"factory": "SparseMLP", "dtype": "bf16", "bf16_img_s": 4041.6, "int8_img_s": 2533.5, "bf16_argmax": 0.9688, "int8_argmax": 0.9219},
    "swin_mlp": {"factory": "SwinMLP", "dtype": "bf16", "bf16_img_s": 8733.0, "int8_img_s": 6357.4, "bf16_argmax": 0.9688, "int8_argmax": 0.9062},
    "vip": {"factory": "ViP", "dtype": "bf16", "bf16_img_s": 7625.4, "int8_img_s": 4911.7, "bf16_argmax": 0.9531, "int8_argmax": 0.9688},
    "wave_mlp": {"factory": "WaveMLP", "dtype": "bf16", "bf16_img_s": 5124.9, "int8_img_s": 4548.0, "bf16_argmax": 0.9844, "int8_argmax": 0.9688},
}

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
