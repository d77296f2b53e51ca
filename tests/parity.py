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

    # export roundtrip: every imported tensor must come back bit-exact
    # through the traced inverse weight map (core/export.py). Tensors the
    # importer drops are either deterministic buffers whose init_sd template
    # already equals the reference value (e.g. CycleFC's offset buffer), or
    # must be provably dead in the reference forward (perturb-proof below).
    exported, dropped = ours.export_torch_state_dict(
        tensors=False, return_dropped=True
    )
    perturb = []
    for k, v in ref.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        assert k in exported, f"export missing {k}"
        if k in dropped and not np.array_equal(exported[k], v.numpy()):
            perturb.append(k)
            continue
        np.testing.assert_array_equal(
            exported[k], v.numpy(), err_msg=f"export roundtrip: {k}"
        )
    if perturb:
        with torch.no_grad():
            for k in perturb:
                name, attr = k.rsplit(".", 1)
                getattr(ref.get_submodule(name), attr).add_(1.0)
            perturbed = ref(x).numpy()
        np.testing.assert_array_equal(
            perturbed, want,
            err_msg=f"importer drops live parameters: {perturb}",
        )
    return got, want
