"""DCNv2 surface tests: conv vs the torchvision-semantics stub; pooling sanity
mirroring the reference's embedded self-tests (dcn_v2.py:1485-1546)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from conftest import assert_close
from ref_loader import deform_conv2d as tv_deform_conv2d

from jittor_mlp_tpu.ops.deform import deform_conv2d as jx_deform_conv2d
from jittor_mlp_tpu.ops import dcn


def test_deform_conv2d_matches_torchvision_semantics():
    rng = np.random.default_rng(0)
    B, C, H, W, O, kh, kw, G = 2, 8, 9, 10, 12, 3, 3, 2
    x = rng.standard_normal((B, C, H, W)).astype("float32")
    off = (rng.standard_normal((B, 2 * G * kh * kw, H, W)) * 1.5).astype("float32")
    msk = rng.uniform(0, 1, (B, G * kh * kw, H, W)).astype("float32")
    w = rng.standard_normal((O, C, kh, kw)).astype("float32") * 0.1
    b = rng.standard_normal((O,)).astype("float32")

    want = tv_deform_conv2d(
        torch.from_numpy(x), torch.from_numpy(off), torch.from_numpy(w),
        torch.from_numpy(b), stride=1, padding=1, dilation=1,
        mask=torch.from_numpy(msk),
    ).numpy()
    got = np.asarray(
        jx_deform_conv2d(
            jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
            jnp.transpose(jnp.asarray(off), (0, 2, 3, 1)),
            jnp.asarray(w), jnp.asarray(b), stride=1, padding=1,
            mask=jnp.transpose(jnp.asarray(msk), (0, 2, 3, 1)),
        )
    ).transpose(0, 3, 1, 2)
    assert_close(got, want, tol=1e-4, name="deform_conv2d")


def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 8, 8)).astype("float32")
    w = rng.standard_normal((6, 4, 3, 3)).astype("float32") * 0.2
    off = np.zeros((1, 2 * 9, 8, 8), "float32")
    got = np.asarray(dcn.dcn_v2_conv(
        jnp.asarray(x), jnp.asarray(off), None, jnp.asarray(w), None,
        stride=1, padding=1))
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1
    ).numpy()
    assert_close(got, want, tol=1e-4, name="zero-offset conv")


def test_dcn_module_forward_and_grad():
    m = dcn.DCN(4, 6, 3, stride=1, padding=1, deformable_groups=1)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 4, 8, 8)),
                    jnp.float32)
    out = m(x)
    assert out.shape == (2, 6, 8, 8)

    def loss(w):
        m2 = dcn.DCN(4, 6, 3, 1, 1)
        m2.weight = w
        return m2(x).sum()

    g = jax.grad(loss)(m.weight)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_psroi_pooling_uniform_average():
    # constant input, no_trans, ROI covering a region -> output equals const
    C = 8
    x = jnp.full((1, C, 16, 16), 3.0)
    rois = jnp.asarray([[0, 0, 0, 7, 7]], jnp.float32)
    pool = dcn.DCNv2Pooling(spatial_scale=1.0, pooled_size=2, output_dim=C,
                            no_trans=True, group_size=2)
    out = pool(x, rois)
    assert out.shape == (1, C, 2, 2)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)


def test_deform_conv2d_jt_shim():
    x = jnp.ones((1, 4, 6, 6))
    w = jnp.ones((4, 4, 1, 1)) * 0.25
    off = jnp.zeros((1, 2, 6, 6))
    out = dcn.deform_conv2d_jt(x, off, w)
    assert out.shape == (1, 4, 6, 6)
    np.testing.assert_allclose(np.asarray(out), 4 * 0.25, rtol=1e-5)


def test_dcn_pooling_with_learned_offsets():
    """DCNPooling (dcn_v2.py:1423-1482): self-predicted trans + mask."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16)), jnp.float32)
    rois = jnp.asarray([[0, 1, 1, 10, 10], [0, 4, 4, 12, 12]], jnp.float32)
    pool = dcn.DCNPooling(spatial_scale=1.0, pooled_size=2, output_dim=8,
                          no_trans=False, group_size=2, trans_std=0.1)
    out = pool(x, rois)
    assert out.shape == (2, 8, 2, 2)
    assert np.isfinite(np.asarray(out)).all()
    # zero-init final fc -> offsets 0 and mask sigmoid(0)=0.5: equals the
    # no-trans pooling scaled by 0.5
    base = dcn.DCNv2Pooling(spatial_scale=1.0, pooled_size=2, output_dim=8,
                            no_trans=True, group_size=2)(x, rois)
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(base),
                               rtol=1e-5)


def test_hat_sample_matches_gather_oracle():
    """_hat_sample_1d (MXU formulation) == _linear_sample_1d (gather oracle)
    for share groups and offsets spanning the out-of-range boundaries."""
    from jittor_mlp_tpu.ops.deform import _hat_sample_1d, _linear_sample_1d

    rng = np.random.default_rng(7)
    B, H, W, C = 2, 9, 7, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    for axis in (1, 2):
        n = x.shape[axis]
        # offsets from far out-of-range to in-range fractional
        base = rng.uniform(-n - 1.5, n + 1.5, (B, H, W, C)).astype("float32")
        for share in (1, 2, 4):
            off = base.reshape(B, H, W, C // share, share)
            off = np.repeat(off[..., :1], share, axis=-1).reshape(B, H, W, C)
            want = np.asarray(_linear_sample_1d(x, jnp.asarray(off), axis))
            got = np.asarray(_hat_sample_1d(x, jnp.asarray(off), axis, share))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                       err_msg=f"axis={axis} share={share}")

def test_hat_sample_banded_matches_exact_in_band():
    """_hat_sample_1d_banded == _hat_sample_1d whenever |offset| <= band, and
    saturates (clips the offset to +-band) beyond it. The banded path is the
    opt-in ActiveMLP(offset_band=) fast sampler: O(band) static shifts on the
    VPU instead of the O(n) hat-matrix MXU contraction."""
    from jittor_mlp_tpu.ops.deform import _hat_sample_1d, _hat_sample_1d_banded

    rng = np.random.default_rng(11)
    B, H, W, C = 2, 9, 7, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    for axis in (1, 2):
        for share in (1, 2):
            g = C // share
            off = rng.uniform(-3.9, 3.9, (B, H, W, g)).astype("float32")
            off = np.repeat(off, share, axis=-1)
            want = np.asarray(_hat_sample_1d(x, jnp.asarray(off), axis, share))
            got = np.asarray(
                _hat_sample_1d_banded(x, jnp.asarray(off), axis, share, band=4)
            )
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                       err_msg=f"axis={axis} share={share}")
            # out-of-band offsets saturate at the band edge
            off2 = np.repeat(
                rng.uniform(5.0, 9.0, (B, H, W, g)).astype("float32"),
                share, axis=-1)
            sat = np.asarray(
                _hat_sample_1d(x, jnp.asarray(np.full_like(off2, 4.0)), axis,
                               share))
            got2 = np.asarray(
                _hat_sample_1d_banded(x, jnp.asarray(off2), axis, share,
                                      band=4))
            np.testing.assert_allclose(got2, sat, rtol=1e-5, atol=1e-5)


def test_active_mlp_banded_model_agrees():
    """Full ActiveMLP forward with offset_band set agrees with the exact path
    when the learned offsets are within the band (true at init: offsets come
    from a zero-ish linear layer, |off| << 1)."""
    from jittor_mlp_tpu.models.active_mlp import ActiveMLP

    kw = dict(img_size=32, depths=[2, 2], embed_dims=[32, 64],
              mlp_ratios=[2, 2], share_dims=[2, 2], num_classes=10, seed=3)
    m_exact = ActiveMLP(**kw)
    m_band = ActiveMLP(offset_band=4, **kw)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 3, 32, 32)), jnp.float32)
    a = np.asarray(m_exact.apply(m_exact.params, x, train=False))
    b = np.asarray(m_band.apply(m_band.params, x, train=False))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_dcn_module_torch_import_parity():
    """Mirror of the reference's test_conv (dcn_v2.py:1485-1496) with weight
    import: a torch DCN twin (conv_offset_mask Conv2d + deform_conv2d, per
    dcn_v2.py:1330-1360) built on the torchvision-semantics CPU stub; our DCN
    imports its state_dict and must match forward AND input gradient."""
    import torch.nn as nn

    torch.manual_seed(0)

    class TorchDCN(nn.Module):
        def __init__(self, cin, cout, k, stride, padding, deformable_groups):
            super().__init__()
            self.stride, self.padding = stride, padding
            self.weight = nn.Parameter(torch.randn(cout, cin, k, k) * 0.1)
            self.bias = nn.Parameter(torch.randn(cout) * 0.1)
            self.conv_offset_mask = nn.Conv2d(
                cin, deformable_groups * 3 * k * k, k, stride, padding
            )
            # reference zero-inits these; randomize small so the deformable
            # path is actually exercised
            with torch.no_grad():
                self.conv_offset_mask.weight.mul_(0.05)
                self.conv_offset_mask.bias.normal_(0, 0.05)

        def forward(self, x):
            om = self.conv_offset_mask(x)
            o1, o2, mask = torch.chunk(om, 3, dim=1)
            offset = torch.cat((o1, o2), dim=1)
            mask = torch.sigmoid(mask)
            return tv_deform_conv2d(
                x, offset, self.weight, self.bias,
                stride=(self.stride, self.stride),
                padding=(self.padding, self.padding),
                mask=mask,
            )

    tm = TorchDCN(4, 6, 3, 1, 1, deformable_groups=2).eval()
    ours = dcn.DCN(4, 6, 3, 1, 1, deformable_groups=2)
    ours.load_torch_state_dict(tm.state_dict())

    x_np = np.random.default_rng(3).standard_normal((2, 4, 12, 12)).astype("float32")
    x_t = torch.tensor(x_np, requires_grad=True)
    want = tm(x_t)
    want.sum().backward()
    got = np.asarray(ours(jnp.asarray(x_np)))
    assert_close(got, want.detach().numpy(), tol=1e-4, name="DCN import fwd")

    gx = jax.grad(lambda x: ours(x).sum())(jnp.asarray(x_np))
    assert_close(np.asarray(gx), x_t.grad.numpy(), tol=1e-4,
                 name="DCN import input grad")


def test_dcnpooling_torch_import_fc_layout():
    """DCNPooling imports the reference's nn.Sequential fc layout (Linears at
    offset_mask_fc.{0,2,4}, dcn_v2.py:1425-1435); validated by comparing our
    full forward against a composition that runs the fc stack in torch."""
    import torch.nn as nn

    torch.manual_seed(1)
    P, C = 2, 8
    fc = nn.Sequential(
        nn.Linear(P * P * C, 16), nn.ReLU(),
        nn.Linear(16, 16), nn.ReLU(),
        nn.Linear(16, P * P * 3),
    )
    with torch.no_grad():  # non-zero final layer so trans path is exercised
        fc[4].weight.normal_(0, 0.1)
        fc[4].bias.normal_(0, 0.1)

    pool = dcn.DCNPooling(spatial_scale=1.0, pooled_size=P, output_dim=C,
                          no_trans=False, group_size=2, trans_std=0.1)
    sd = {f"offset_mask_fc.{k}": v for k, v in fc.state_dict().items()}
    pool.load_torch_state_dict(sd)

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, C, 16, 16)), jnp.float32)
    rois = jnp.asarray([[0, 1, 1, 10, 10], [0, 4, 4, 12, 12]], jnp.float32)
    got = np.asarray(pool(x, rois))

    # manual composition: our no-trans pooling -> torch fc -> our trans pooling
    n = rois.shape[0]
    zeros = jnp.zeros((n, 2, P, P))
    roi, _ = dcn.dcn_v2_pooling(x, rois, zeros, 1.0, P, C, True, 2, P, 4, 0.1)
    with torch.no_grad():
        om = fc(torch.from_numpy(np.asarray(roi).reshape(n, -1))).numpy()
    om = om.reshape(n, 3, P, P)
    offset = jnp.asarray(np.concatenate([om[:, 0:1], om[:, 1:2]], axis=1))
    mask = jax.nn.sigmoid(jnp.asarray(om[:, 2:3]))
    want, _ = dcn.dcn_v2_pooling(x, rois, offset, 1.0, P, C, False, 2, P, 4, 0.1)
    want = np.asarray(want * mask)
    assert_close(got, want, tol=1e-5, name="DCNPooling fc import")


def test_active_mlp_auto_band_checked_default(monkeypatch):
    """offset_band="auto" (the default) must match the exact hat path to
    reassociation noise: in eval every resolvable offset layer uses the
    UNCLAMPED banded sampler at band = min(⌈bound·1.05⌉, n−1), which is
    exact for any offsets — in-bound offsets never reach the cap (the
    provable _offset_bound covers them: Cauchy-Schwarz on the
    LN-normalized vector, ‖ŷ‖₂ ≤ √C), and taps |d| ≥ n are identically
    zero, so no clamp is needed."""
    from jittor_mlp_tpu.models import active_mlp as am
    from jittor_mlp_tpu.models.active_mlp import ActiveMLP, _offset_bound

    # force engage-everywhere at this tiny batch: the batch/stage gate is a
    # pure perf choice and would otherwise leave some stages on the (then
    # trivially equal) exact path, weakening the exactness claim under test
    monkeypatch.setattr(am, "_ENGAGE_ALL_MIN_BATCH", 1)

    kw = dict(img_size=64, depths=[2, 2], embed_dims=[32, 64],
              mlp_ratios=[2, 2], share_dims=[2, 2], num_classes=10, seed=3)
    m_auto = ActiveMLP(**kw)  # default offset_band="auto"
    m_exact = ActiveMLP(offset_band=None, **kw)

    # sanity: both offset layers resolve to finite bounds (so the banded
    # path engages everywhere — otherwise the equality below is vacuous)
    for i in range(2):
        bound = _offset_bound(m_auto.params["blocks"][i][0]["offset_layer"])
        assert bound is not None and np.isfinite(bound) and bound > 0

    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 3, 64, 64)), jnp.float32)
    a = np.asarray(m_auto.apply(m_auto.params, x, train=False))
    b = np.asarray(m_exact.apply(m_exact.params, x, train=False))
    # same math, different summation order (banded: 2·band+1 sequential
    # VPU FMAs; exact: O(n) einsum) — equal to reassociation noise
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # training always takes the exact path (params move; bounds go stale)
    ra = np.asarray(m_auto.apply(m_auto.params, x, train=True, rng=jax.random.key(0)))
    rb = np.asarray(m_exact.apply(m_exact.params, x, train=True, rng=jax.random.key(0)))
    np.testing.assert_array_equal(ra, rb)


def test_active_mlp_offset_bound_is_sound():
    """_offset_bound upper-bounds the achievable |offset| over ANY input:
    random probes never exceed it, and the adversarial input (LN output
    aligned with the worst weight row) gets within 1% — i.e. the bound is
    sound and near-tight, so band=⌈bound⌉ provably covers every offset."""
    from jittor_mlp_tpu.core import nnf
    from jittor_mlp_tpu.models.active_mlp import ActiveMLP, _offset_bound

    m = ActiveMLP(img_size=64, depths=[2, 2], embed_dims=[32, 64],
                  mlp_ratios=[2, 2], share_dims=[2, 2], num_classes=10, seed=7)
    op = m.params["blocks"][0][0]["offset_layer"]
    bound = _offset_bound(op)

    def offsets(v):  # the model's offset computation on a (N, C) batch
        o = nnf.layer_norm(op["0"], v)
        return nnf.linear(op["1"], o)

    rng = np.random.default_rng(0)
    probes = jnp.asarray(rng.standard_normal((4096, 32)) *
                         rng.uniform(0.1, 100, (4096, 1)), jnp.float32)
    assert float(jnp.abs(offsets(probes)).max()) <= bound + 1e-5

    # adversarial: x whose LN-normalization aligns with the worst row of W⊙γ
    W = np.asarray(op["1"]["weight"], np.float64)
    g = np.asarray(op["0"]["weight"], np.float64)
    v = W * g[None, :]
    v = v - v.mean(axis=1, keepdims=True)
    k = int(np.linalg.norm(v, axis=1).argmax())
    adv = jnp.asarray(v[k][None, :], jnp.float32)  # LN maps it to ∝ itself
    got = float(jnp.abs(offsets(adv)).max())
    assert got <= bound + 1e-5
    assert got >= 0.99 * abs(
        np.linalg.norm(v[k]) * np.sqrt(32)
        - abs(W[k] @ np.asarray(op["0"]["bias"], np.float64)
              + np.asarray(op["1"]["bias"], np.float64)[k])
    ) - 1e-5, f"bound far from achievable: {got} vs {bound}"


def test_active_mlp_auto_band_reresolves_on_import(monkeypatch):
    """load_torch_state_dict re-resolves the bounds from the imported
    weights: scaling the offset layers up by 100× pushes every bound far
    past the per-axis tap cap, so the auto path runs at band = n−1 with
    genuinely out-of-cap-magnitude bounds — outputs must still match
    offset_band=None with the same weights (the unclamped capped sampler
    is exact for any offset). The export round trip (index-tagged importer
    trace) must survive the resolve hook."""
    from jittor_mlp_tpu.models import active_mlp as am
    from jittor_mlp_tpu.models.active_mlp import ActiveMLP

    monkeypatch.setattr(am, "_ENGAGE_ALL_MIN_BATCH", 1)  # see test above

    kw = dict(img_size=64, depths=[2, 2], embed_dims=[32, 64],
              mlp_ratios=[2, 2], share_dims=[2, 2], num_classes=10, seed=3)
    m = ActiveMLP(**kw)
    sd = m.export_torch_state_dict(tensors=False)  # hook sees tagged ints
    sd = {k: (v * 100.0 if "offset_layer.1.weight" in k else v)
          for k, v in sd.items()}
    m.load_torch_state_dict(sd)
    m_exact = ActiveMLP(offset_band=None, **kw)
    m_exact.load_torch_state_dict(sd)
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 3, 64, 64)), jnp.float32)
    a = np.asarray(m.apply(m.params, x, train=False))
    b = np.asarray(m_exact.apply(m_exact.params, x, train=False))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_hat_sample_banded_unclamped_exact_for_any_offset():
    """saturate=False: the unclamped banded sampler with the per-axis n−1
    tap cap equals _hat_sample_1d for ANY offset — far out of band, beyond
    the axis length, fractional — because every contributing (i, j) pair
    has |j − i| ≤ n−1 and zero-coefficient taps add nothing. This is the
    ActiveMLP offset_band="auto" fast path's exactness contract."""
    from jittor_mlp_tpu.ops.deform import _hat_sample_1d, _hat_sample_1d_banded

    rng = np.random.default_rng(13)
    B, H, W, C = 2, 9, 7, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    for axis in (1, 2):
        n = x.shape[axis]
        for share in (1, 2):
            g = C // share
            off = rng.uniform(-n - 2.5, n + 2.5, (B, H, W, g)).astype("float32")
            off = np.repeat(off, share, axis=-1)
            want = np.asarray(_hat_sample_1d(x, jnp.asarray(off), axis, share))
            # band far above the cap: the sampler must cap it at n−1 itself
            got = np.asarray(_hat_sample_1d_banded(
                x, jnp.asarray(off), axis, share, band=50, saturate=False))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                       err_msg=f"axis={axis} share={share}")
            # and with a small band covering the offsets, same result
            off2 = np.repeat(
                rng.uniform(-1.9, 1.9, (B, H, W, g)).astype("float32"),
                share, axis=-1)
            want2 = np.asarray(_hat_sample_1d(x, jnp.asarray(off2), axis, share))
            got2 = np.asarray(_hat_sample_1d_banded(
                x, jnp.asarray(off2), axis, share, band=2, saturate=False))
            np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)
