"""jittor_mlp_tpu — a TPU-native JAX/XLA/Pallas rebuild of the Jittor-MLP vision-MLP zoo.

The reference (liuruiyang98/Jittor-MLP) is a dual PyTorch/Jittor model zoo of ~20
MLP-style image classifiers plus a cross-framework parity harness
(/root/reference/compare.py). This package re-exposes the same factory API
(/root/reference/models_pytorch/__init__.py:1-22) with a TPU-first design:

- functional core: every model is a pure ``apply(params, x)`` jitted function;
  params are PyTrees whose structure mirrors the torch ``state_dict`` so torch
  checkpoints import as a dict reshape (see ``core.pytree``).
- NHWC layout internally, conv weights kept in torch OIHW layout and consumed via
  ``dimension_numbers=('NHWC','OIHW','NHWC')`` — no weight transposition on import.
- repeated homogeneous blocks are stacked on a leading axis and driven by
  ``jax.lax.scan`` for O(1) trace size and fast compiles.
- spatial shift/roll mixers lower to static pad/slice compositions (XLA fuses
  these); deformable sampling / fused blocks get Pallas kernels (``ops.pallas``).
"""

from . import config
from . import train_recipes
from .core.model import Model
from .serving import MicroBatcher, Predictor
from . import deploy

# Model factories — same export surface as the reference zoos
# (/root/reference/models_pytorch/__init__.py:1-22 and models_jittor/__init__.py:1-19).
from .models.mlp_mixer import MLPMixerForImageClassification
from .models.g_mlp import gMLPForImageClassification
from .models.res_mlp import ResMLPForImageClassification
from .models.vip import ViP
from .models.s2_mlp_v1 import S2MLPv1_deep, S2MLPv1_wide
from .models.s2_mlp_v2 import S2MLPv2
from .models.conv_mixer import ConvMixer
from .models.conv_mlp import convmlp_s, convmlp_m, convmlp_l
from .models.raft_mlp import RaftMLP
from .models.sparse_mlp import SparseMLP
from .models.hire_mlp import HireMLP
from .models.gfnet import GFNet, GFNetPyramid
from .models.cycle_mlp import (
    CycleMLP_B1,
    CycleMLP_B2,
    CycleMLP_B3,
    CycleMLP_B4,
    CycleMLP_B5,
)
from .models.as_mlp import AS_MLP
from .models.swin_mlp import SwinMLP
from .models.repmlpnet import create_RepMLPNet_B224, create_RepMLPNet_B256
from .models.wave_mlp import WaveMLP
from .models.ms_mlp import MS_MLP
from .models.morph_mlp import MorphMLP
from .models.dyna_mlp import DynaMixer
from .models.active_mlp import ActiveSmall, ActiveBase, ActiveLarge
from .models.sequencer import Sequencer2D

__all__ = [
    "Model",
    "MicroBatcher",
    "Predictor",
    "deploy",
    "config",
    "train_recipes",
    "gMLPForImageClassification",
    "ResMLPForImageClassification",
    "MLPMixerForImageClassification",
    "ViP",
    "S2MLPv1_deep",
    "S2MLPv1_wide",
    "S2MLPv2",
    "ConvMixer",
    "convmlp_s",
    "convmlp_m",
    "convmlp_l",
    "RaftMLP",
    "SparseMLP",
    "HireMLP",
    "GFNet",
    "GFNetPyramid",
    "CycleMLP_B1",
    "CycleMLP_B2",
    "CycleMLP_B3",
    "CycleMLP_B4",
    "CycleMLP_B5",
    "AS_MLP",
    "SwinMLP",
    "create_RepMLPNet_B224",
    "create_RepMLPNet_B256",
    "WaveMLP",
    "MS_MLP",
    "MorphMLP",
    "DynaMixer",
    "ActiveSmall",
    "ActiveBase",
    "ActiveLarge",
    "Sequencer2D",
]

__version__ = "0.1.0"
