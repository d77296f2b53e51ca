"""Shared forward-parity harness: torch reference vs jittor_mlp_tpu.

Mirrors the reference's own parity contract (compare.py:144-186): identical
weights via state_dict import, then compare forward outputs. We check max
absolute/relative deviation at the ≤1e-4 target from BASELINE.md."""

from __future__ import annotations

import numpy as np
import torch

from conftest import assert_close
from ref_loader import ref_model

import jittor_mlp_tpu  # noqa: F401  (registers factories)
from jittor_mlp_tpu import config


def check_parity(
    ref_module,
    ref_class,
    our_factory,
    kwargs=None,
    ref_kwargs=None,
    input_shape=(2, 3, 32, 32),
    tol=1e-4,
    seed=0,
):
    kwargs = kwargs or {}
    ref_kwargs = ref_kwargs if ref_kwargs is not None else kwargs
    ref = ref_model(ref_module, ref_class, seed=seed, **ref_kwargs)
    ours = our_factory(**kwargs)
    ours.load_torch_state_dict(ref.state_dict())

    torch.manual_seed(seed + 1)
    x = torch.randn(*input_shape)
    with torch.no_grad():
        want = ref(x).numpy()
    with config.parity_mode():
        got = np.asarray(ours.eval()(x))
    assert_close(got, want, tol=tol, name=f"{ref_module}.{ref_class}")
    return got, want
