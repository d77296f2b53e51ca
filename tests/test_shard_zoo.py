"""Model.shard exact agreement across the WHOLE zoo (VERDICT r2 item 5).

Every factory, tiny config, DP+TP over the virtual 8-device mesh: the shard
heuristic (parallel/train.py:_leaf_spec) must either shard correctly or
replicate — never mis-shard. Exact forward agreement with the unsharded
model is the oracle; a wrong guess shows up as a numeric or layout failure.

``min_dim=8`` forces REAL tensor-parallel sharding at these tiny configs
(at the production default of 512 every tiny leaf would replicate and the
test would only exercise DP) — so every family's exotic leaves (stacked
scan blocks, LSTM ih/hh, grouped FCs, 6D einsum operands) actually run
split over the 'model' axis with XLA-inserted collectives.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from parity_report import build_cases  # noqa: E402

import jittor_mlp_tpu  # noqa: E402
from jittor_mlp_tpu.parallel import make_mesh  # noqa: E402

CASES = build_cases()


@pytest.mark.parametrize(
    "name,factory,kwargs,img", [(c[0], c[3], c[4], c[5]) for c in CASES],
    ids=[c[0] for c in CASES],
)
def test_shard_exact_agreement(name, factory, kwargs, img):
    mesh = make_mesh(8, model_parallel=2)
    model = factory(**kwargs)
    x = np.random.default_rng(1).standard_normal((8, 3, img, img)).astype(
        np.float32
    )
    want = np.asarray(model(x))
    model.shard(mesh, min_dim=8)
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
