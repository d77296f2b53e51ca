"""RepMLPNet tiled-depthwise Local Perceptron path (hp == wp == 1).

Every driver config (B224/B256) has hs == H per stage, so the repconv
branch runs on the unpartitioned map as a full-C depthwise conv with the
shareset kernel tiled C/S times (models/repmlpnet.py:_conv_bn_tiled)
instead of the reference's S-channel grouped conv (1/128 lane utilization
at stage 0). These tests pin the fast path against the torch reference
(eval) and against the reference-layout grouped path (train-mode stats).
"""

import numpy as np

import jax.numpy as jnp

import jittor_mlp_tpu as jm
from conftest import assert_close
from jittor_mlp_tpu.core import nnf
from jittor_mlp_tpu.models.repmlpnet import _conv_bn, _conv_bn_tiled
from parity import check_parity

# image 16 / patch 2 -> stage0 H=8 with h=8; stage1 H=4 with h=4: hp=wp=1
# in both stages, like the driver's B224/B256 configs
FAST_CFG = dict(
    in_channels=3,
    num_class=10,
    patch_size=(2, 2),
    num_blocks=(1, 2),
    channels=(8, 16),
    hs=(8, 4),
    ws=(8, 4),
    sharesets_nums=(2, 4),
    reparam_conv_k=(1, 3),
)


def test_fastpath_parity_vs_torch():
    check_parity(
        "repmlpnet",
        "RepMLPNet",
        jm.models.repmlpnet.RepMLPNet,
        dict(FAST_CFG),
        input_shape=(2, 3, 16, 16),
    )


def _rand_branch_params(rng, S, k):
    return {
        "conv": {"weight": jnp.asarray(
            rng.standard_normal((S, 1, k, k)).astype("float32"))},
        "bn": {
            "weight": jnp.asarray(
                rng.standard_normal((S,)).astype("float32")),
            "bias": jnp.asarray(
                rng.standard_normal((S,)).astype("float32")),
            "running_mean": jnp.asarray(
                rng.standard_normal((S,)).astype("float32")),
            "running_var": jnp.asarray(
                rng.random((S,)).astype("float32") + 0.5),
        },
    }


def _grouped_reference(p, x_nchw, S, k, train):
    """The reference-layout path: partition channels into (C/S, S) batch
    rows, grouped conv + BN, restore — what _repmlp_block's hp>1 branch
    does (and the torch model always does, repmlpnet.py:96-125)."""
    N, C, H, W = x_nchw.shape
    conv_in = x_nchw.reshape(-1, S, H, W).transpose(0, 2, 3, 1)
    y = _conv_bn(p, conv_in, padding=k // 2, groups=S, train=train)
    return y.transpose(0, 3, 1, 2).reshape(N, C, H, W)


def test_tiled_matches_grouped_eval_and_train():
    rng = np.random.default_rng(3)
    S, rep, k = 4, 3, 3
    C = S * rep
    x = jnp.asarray(rng.standard_normal((2, C, 8, 8)).astype("float32"))
    p = _rand_branch_params(rng, S, k)

    for train in (False, True):
        want = _grouped_reference(p, x, S, k, train)
        got = _conv_bn_tiled(
            p, x.transpose(0, 2, 3, 1), rep, k, train
        ).transpose(0, 3, 1, 2)
        assert_close(np.asarray(got), np.asarray(want), tol=1e-5,
                     name=f"tiled vs grouped train={train}")


def test_tiled_sink_stats_match_grouped():
    """The BN-EMA sink entries (id, mean, var, n) from the tiled path must
    equal the grouped path's: same pooled per-shareset stats, same count."""
    rng = np.random.default_rng(4)
    S, rep, k = 2, 4, 1
    C = S * rep
    x = jnp.asarray(rng.standard_normal((2, C, 6, 6)).astype("float32"))
    p = _rand_branch_params(rng, S, k)
    p["bn"]["_bn_id"] = jnp.int32(7)

    def collect(fn):
        sink = []
        old = nnf._bn_sink
        nnf._bn_sink = sink
        try:
            fn()
        finally:
            nnf._bn_sink = old
        assert len(sink) == 1
        return sink[0]

    _, m_g, v_g, n_g = collect(
        lambda: _grouped_reference(p, x, S, k, True))
    _, m_t, v_t, n_t = collect(
        lambda: _conv_bn_tiled(p, x.transpose(0, 2, 3, 1), rep, k, True))
    assert_close(np.asarray(m_t), np.asarray(m_g), tol=1e-5, name="mean")
    assert_close(np.asarray(v_t), np.asarray(v_g), tol=1e-5, name="var")
    assert float(n_t) == float(n_g)
