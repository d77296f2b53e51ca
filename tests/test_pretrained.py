"""End-to-end pretrained-checkpoint path: convmlp_s(pretrained=True).

This container has zero network egress, so the published URL
(/root/reference/models_pytorch/conv_mlp.py:278-285) can never be fetched
here. Instead a checkpoint in the published on-disk format (a bare
state_dict .pth) is staged in JITTOR_MLP_TPU_CKPT_DIR — the framework's
offline resolution path for air-gapped TPU pods — and the complete
pretrained flow (resolve → torch.load → ['model'] unwrap → weight import)
is validated at full 224² size: logits ≤1e-4 vs the torch reference
carrying the same weights, plus 100% argmax agreement.
"""

import numpy as np
import torch

from conftest import assert_close
from ref_loader import recalibrate_ref_bn, ref_model

import jittor_mlp_tpu as jm
from jittor_mlp_tpu import config


def _staged_checkpoint(tmp_path, wrap_model_key=False):
    ref = ref_model("conv_mlp", "convmlp_s")
    recalibrate_ref_bn(ref)  # trained-like running stats
    sd = ref.state_dict()
    obj = {"model": sd} if wrap_model_key else sd
    torch.save(obj, tmp_path / "convmlp_s_imagenet.pth")
    return ref


def test_convmlp_pretrained_end_to_end(tmp_path, monkeypatch):
    ref = _staged_checkpoint(tmp_path)
    monkeypatch.setenv("JITTOR_MLP_TPU_CKPT_DIR", str(tmp_path))

    ours = jm.convmlp_s(pretrained=True)

    torch.manual_seed(3)
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        want = ref(x).numpy()
    with config.parity_mode():
        got = np.asarray(ours(x))

    assert_close(got, want, tol=1e-4, name="convmlp_s pretrained logits")
    assert (got.argmax(-1) == want.argmax(-1)).all(), "argmax disagreement"


def test_pretrained_model_key_unwrap(tmp_path, monkeypatch):
    # the ['model'] container convention (wave_mlp.py:147-148 in the ref)
    ref = _staged_checkpoint(tmp_path, wrap_model_key=True)
    monkeypatch.setenv("JITTOR_MLP_TPU_CKPT_DIR", str(tmp_path))
    ours = jm.convmlp_s(pretrained=True)
    torch.manual_seed(3)
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        want = ref(x).numpy()
    with config.parity_mode():
        got = np.asarray(ours(x))
    assert_close(got, want, tol=1e-4, name="['model'] unwrap")


def test_wavemlp_pretrained_end_to_end(tmp_path, monkeypatch):
    """WaveMLP's path-style pretrained= (ref wave_mlp.py:147-148:
    torch.load(pretrained)['model']) through the staged offline flow:
    a bare filename resolves against JITTOR_MLP_TPU_CKPT_DIR, the ['model']
    container unwraps, and the imported full-size forward matches the torch
    reference carrying the same weights."""
    ref = ref_model("wave_mlp", "WaveMLP", model_name="T")
    recalibrate_ref_bn(ref)
    torch.save({"model": ref.state_dict()}, tmp_path / "wavemlp_t.pth")
    monkeypatch.setenv("JITTOR_MLP_TPU_CKPT_DIR", str(tmp_path))

    ours = jm.WaveMLP(model_name="T", pretrained="wavemlp_t.pth")

    torch.manual_seed(4)
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        want = ref(x).numpy()
    with config.parity_mode():
        got = np.asarray(ours(x))
    assert_close(got, want, tol=1e-4, name="wave_mlp pretrained logits")
    assert (got.argmax(-1) == want.argmax(-1)).all(), "argmax disagreement"


def test_morphmlp_pretrained_end_to_end(tmp_path, monkeypatch):
    """MorphMLP's path-style pretrained= (ref morph_mlp.py:150-151), same
    staged offline flow, full-size logit parity + argmax agreement."""
    ref = ref_model("morph_mlp", "MorphMLP", model_name="T")
    recalibrate_ref_bn(ref)
    torch.save({"model": ref.state_dict()}, tmp_path / "morphmlp_t.pth")
    monkeypatch.setenv("JITTOR_MLP_TPU_CKPT_DIR", str(tmp_path))

    ours = jm.MorphMLP(model_name="T", pretrained="morphmlp_t.pth")

    torch.manual_seed(4)
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        want = ref(x).numpy()
    with config.parity_mode():
        got = np.asarray(ours(x))
    assert_close(got, want, tol=1e-4, name="morph_mlp pretrained logits")
    assert (got.argmax(-1) == want.argmax(-1)).all(), "argmax disagreement"
