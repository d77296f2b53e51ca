"""Int8 weight quantization: error bounds, checkpoint roundtrip/size, and
full-model accuracy on the pretrained-format ConvMLP weights."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import jittor_mlp_tpu as jm
from jittor_mlp_tpu import config
from jittor_mlp_tpu.quant import (
    dequantize_tree,
    load_quantized,
    quantize_tree,
    quantized_nbytes,
    save_quantized,
)
from jittor_mlp_tpu.utils.serialization import save_params
from ref_loader import recalibrate_ref_bn, ref_model


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.1
    q = quantize_tree({"w": w})
    back = np.asarray(dequantize_tree(q, jnp.float32)["w"])
    # symmetric int8: per-channel error ≤ absmax/(2*127)
    bound = np.abs(w).max(axis=1, keepdims=True) / 127.0
    assert (np.abs(back - w) <= 0.5 * bound + 1e-8).all()


def test_small_leaves_pass_through():
    tree = {
        "weight": np.ones((64, 64), np.float32),
        "bias": np.arange(64, dtype=np.float32),
        "_bn_id": np.int32(3),
    }
    q = quantize_tree(tree)
    assert "__q_int8__" in q["weight"]
    assert isinstance(q["bias"], np.ndarray)  # 1-D: untouched
    back = dequantize_tree(q, jnp.float32)
    np.testing.assert_allclose(np.asarray(back["bias"]), tree["bias"])
    assert back["_bn_id"].dtype == np.int32


def test_quantized_checkpoint_roundtrip_and_size(tmp_path):
    model = jm.MLPMixerForImageClassification(
        image_size=32, patch_size=8, d_model=64, depth=2, num_classes=10,
        use_pallas=False,
    )
    f32 = save_params(model, tmp_path / "full.npz")
    q = save_quantized(model, tmp_path / "q.npz")
    assert q.stat().st_size < 0.45 * f32.stat().st_size

    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(
        np.float32
    )
    want = np.asarray(model(x))
    model2 = jm.MLPMixerForImageClassification(
        image_size=32, patch_size=8, d_model=64, depth=2, num_classes=10,
        seed=1, use_pallas=False,
    )
    load_quantized(model2, tmp_path / "q.npz", dtype=jnp.float32)
    got = np.asarray(model2(x))
    # int8 noise only — logits track the fp32 model closely
    assert np.abs(got - want).max() < 0.05 * max(np.abs(want).max(), 1.0)
    assert (got.argmax(-1) == want.argmax(-1)).all()


def test_int8_convmlp_full_size_accuracy():
    """Quantize the pretrained-format ConvMLP weights; fp32 compute isolates
    the int8 error: logits must stay close and argmax must agree."""
    ref = ref_model("conv_mlp", "convmlp_s")
    recalibrate_ref_bn(ref)
    ours = jm.convmlp_s()
    ours.load_torch_state_dict(ref.state_dict())

    torch.manual_seed(0)
    x = torch.randn(2, 3, 224, 224).numpy()
    with config.parity_mode():
        want = np.asarray(ours(x))
        ours.params = dequantize_tree(
            quantize_tree(ours.params), jnp.float32
        )
        got = np.asarray(ours(x))

    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.05 * scale, (
        np.abs(got - want).max(), scale
    )
    assert (got.argmax(-1) == want.argmax(-1)).all()


def test_predictor_int8_weights_smoke():
    model = jm.MLPMixerForImageClassification(
        image_size=32, patch_size=8, d_model=64, depth=2, num_classes=10,
        use_pallas=False,
    )
    p = jm.Predictor(model, batch_size=2, image_size=32, top_k=3,
                     bf16=False, weights="int8")
    imgs = np.random.default_rng(1).integers(
        0, 255, (2, 32, 32, 3), dtype=np.uint8
    )
    labels, probs = p.predict(imgs)
    assert labels.shape == (2, 3) and probs.shape == (2, 3)
    assert np.isfinite(probs).all()


def test_stacked_leaves_get_per_layer_channel_scales():
    """Depth-stacked scanned-block leaves (L, O, I) must quantize with
    per-(layer, channel) scales, not one scale per whole layer matrix —
    otherwise one outlier channel inflates every channel's step size."""
    from jittor_mlp_tpu.quant import _QKEY, _SKEY, quantize_tree

    rng = np.random.default_rng(0)
    stacked = rng.standard_normal((4, 16, 32)).astype(np.float32)
    stacked[2, 5] *= 100.0  # outlier channel in one layer
    q = quantize_tree({"weight": stacked}, min_size=1)["weight"]
    assert q[_SKEY].shape == (4, 16, 1)
    # channels outside the outlier keep their own (unchanged) scale
    plain = quantize_tree({"weight": stacked[1]}, min_size=1)["weight"]
    np.testing.assert_allclose(
        np.asarray(q[_SKEY][1, :, 0]), np.asarray(plain[_SKEY][:, 0])
    )
    # pointwise-conv weights (O, I, 1, 1) must NOT get per-element scales
    pw = rng.standard_normal((8, 8, 1, 1)).astype(np.float32)
    qpw = quantize_tree({"weight": pw}, min_size=1)["weight"]
    assert qpw[_SKEY].shape == (1, 1, 1, 1) or qpw[_SKEY].shape == (8, 1, 1, 1)
