"""Dynamic W8A8 int8 inference (config.int8_mode / quant.dynamic_int8_matmul).

Pins (a) the quantized contraction against a pure-numpy emulation of the same
scheme (exact), (b) the accuracy bound of one matmul on normal data, (c) an
end-to-end zoo forward: logits under int8_mode stay close to the f32 forward
and the argmax survives on separable logits. The 2× MXU-rate claim is a TPU
property (int8 dot_general); these tests pin semantics on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import jittor_mlp_tpu as jm
from jittor_mlp_tpu import config
from jittor_mlp_tpu.quant import dynamic_int8_matmul


def _emulate(x, wt):
    """Reference numpy emulation of the documented quantization scheme."""
    x = x.astype(np.float32)
    wt = wt.astype(np.float32)
    ax = np.max(np.abs(x), axis=-1, keepdims=True)
    sx = np.where(ax > 0, ax / 127.0, 1.0)
    aw = np.max(np.abs(wt), axis=0, keepdims=True)
    sw = np.where(aw > 0, aw / 127.0, 1.0)
    qx = np.round(x / sx).astype(np.int32)
    qw = np.round(wt / sw).astype(np.int32)
    return (qx @ qw).astype(np.float32) * sx * sw


def test_matches_emulation_exactly():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 7, 33)).astype(np.float32)
    wt = rng.standard_normal((33, 11)).astype(np.float32)
    got = np.asarray(dynamic_int8_matmul(jnp.asarray(x), jnp.asarray(wt)))
    np.testing.assert_allclose(got, _emulate(x, wt), rtol=1e-6, atol=1e-6)


def test_zero_rows_and_zero_weights_safe():
    x = np.zeros((3, 16), np.float32)
    wt = np.zeros((16, 8), np.float32)
    got = np.asarray(dynamic_int8_matmul(jnp.asarray(x), jnp.asarray(wt)))
    assert np.all(got == 0) and np.all(np.isfinite(got))


def test_single_matmul_error_bound():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 384)).astype(np.float32)
    wt = (rng.standard_normal((384, 1536)) / np.sqrt(384)).astype(np.float32)
    exact = x @ wt
    got = np.asarray(dynamic_int8_matmul(jnp.asarray(x), jnp.asarray(wt)))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    # with BOTH sides quantized the expected relative output error on normal
    # data is sqrt(2)·absmax/(127·sqrt(12)·σ) ≈ 1.0% (absmax≈3.2σ at n=384)
    assert rel < 2e-2, rel


@pytest.mark.parametrize("factory,kw", [
    ("MLPMixerForImageClassification",
     dict(image_size=32, patch_size=8, num_classes=10, d_model=64, depth=3)),
    ("ResMLPForImageClassification",
     dict(image_size=32, patch_size=8, num_classes=10, d_model=48, depth=3)),
    # BN family: quant error flows through running-stat normalization
    ("WaveMLP", dict(model_name="T", image_size=32)),
    # windowed family: folded 6D einsum stays f32, stem/FF/head quantize
    ("SwinMLP", dict(img_size=32, patch_size=4, embed_dim=16,
                     depths=[2, 2], num_heads=[2, 4], window_size=4,
                     num_classes=8)),
    # deformable family: masked-matmul CycleFC goes through nnf dense ops
    ("CycleMLP_B1", dict(image_size=32, num_classes=8)),
])
def test_zoo_forward_under_int8_mode(factory, kw):
    model = getattr(jm, factory)(**kw)
    x = np.random.default_rng(2).standard_normal((4, 3, 32, 32)).astype(
        np.float32
    )
    f32 = np.asarray(model(x))
    with config.int8_mode():
        q = np.asarray(model(x))
    assert np.all(np.isfinite(q))
    rel = np.linalg.norm(q - f32) / np.linalg.norm(f32)
    assert rel < 5e-2, rel
    # outside the context the cached f32 executable is used again
    back = np.asarray(model(x))
    np.testing.assert_array_equal(back, f32)


def test_conv1d_token_int8_path():
    from jittor_mlp_tpu.core import nnf

    rng = np.random.default_rng(3)
    p = {"weight": jnp.asarray(rng.standard_normal((9, 13, 1)), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(9), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 13, 5)), jnp.float32)
    exact = np.asarray(nnf.conv1d_token(p, x))
    try:
        config.int8_matmul = True
        q = np.asarray(nnf.conv1d_token(p, x))
    finally:
        config.int8_matmul = False
    assert q.shape == exact.shape
    rel = np.linalg.norm(q - exact) / np.linalg.norm(exact)
    assert rel < 2e-2, rel


def test_int8_under_spmd_mesh():
    """int8_mode composes with Model.shard (DP+TP): the int8 dot_general
    shards like the f32 one and agrees with the unsharded int8 forward."""
    from jittor_mlp_tpu.parallel import make_mesh

    model = jm.MLPMixerForImageClassification(
        image_size=32, patch_size=8, num_classes=10, d_model=64, depth=2
    )
    x = np.random.default_rng(4).standard_normal((8, 3, 32, 32)).astype(
        np.float32
    )
    with config.int8_mode():
        want = np.asarray(model(x))
        model.shard(make_mesh(8, model_parallel=2))
        got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_train_step_rejects_int8_mode():
    import optax
    import pytest

    from jittor_mlp_tpu.parallel.train import make_train_step

    model = jm.MLPMixerForImageClassification(
        image_size=16, patch_size=4, d_model=32, depth=2, num_classes=8
    )
    step = make_train_step(model.apply, optax.sgd(1e-3))
    opt_state = optax.sgd(1e-3).init(model.params)
    batch = {"image": jnp.zeros((2, 3, 16, 16)),
             "label": jnp.zeros((2,), jnp.int32)}
    import jax

    with config.int8_mode(), pytest.raises(RuntimeError, match="inference-only"):
        step(model.params, opt_state, batch, jax.random.PRNGKey(0))


def test_w8a8_convmlp_full_size_accuracy():
    """Dynamic W8A8 on the pretrained-format ConvMLP weights at full 224²:
    logits stay close to fp32 and argmax agrees — the serving-accuracy
    analog of test_quant.test_int8_convmlp_full_size_accuracy, with
    activations quantized too."""
    import sys as _sys

    import torch

    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from ref_loader import recalibrate_ref_bn, ref_model

    ref = ref_model("conv_mlp", "convmlp_s")
    recalibrate_ref_bn(ref)
    ours = jm.convmlp_s()
    ours.load_torch_state_dict(ref.state_dict())

    torch.manual_seed(0)
    x = torch.randn(2, 3, 224, 224).numpy()
    with config.parity_mode():
        want = np.asarray(ours(x))
        with config.int8_mode():
            got = np.asarray(ours(x))

    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.1 * scale, (
        np.abs(got - want).max(), scale
    )
    assert (got.argmax(-1) == want.argmax(-1)).all()
