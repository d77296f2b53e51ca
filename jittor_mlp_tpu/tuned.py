"""Measured best-known training settings per zoo model (GENERATED).

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

_BY_FACTORY = {rec["factory"]: rec for rec in TRAIN.values()}


def train_settings(name):
    """Best-known train settings for ``name`` (sweep key or factory name).

    Returns a dict with keys ``factory, remat, batch, img_s`` or None when
    the model was never swept (custom configs: measure with
    ``compare.py --model <key> --train --try-remat``).
    """
    return TRAIN.get(name) or _BY_FACTORY.get(name)
