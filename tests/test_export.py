"""Params → torch export: exact roundtrip of imported reference weights and
torch-side forward agreement on exported (as-if-trained-here) weights."""

import numpy as np
import torch

import jittor_mlp_tpu as jm
import jittor_mlp_tpu.models.wave_mlp as jm_wave
from ref_loader import load_ref, ref_model

MIXER_KW = dict(image_size=32, patch_size=8, d_model=32, depth=2,
                num_classes=10)


def test_export_roundtrips_imported_reference_weights():
    ref = ref_model("mlp_mixer", "MLPMixerForImageClassification", **MIXER_KW)
    ours = jm.MLPMixerForImageClassification(use_pallas=False, **MIXER_KW)
    sd0 = {k: v.numpy() for k, v in ref.state_dict().items()}
    ours.load_torch_state_dict(sd0)
    sd1 = ours.export_torch_state_dict(tensors=False)
    assert set(sd1) == set(sd0)
    for k in sd0:
        np.testing.assert_allclose(sd1[k], sd0[k], rtol=0, atol=0,
                                   err_msg=k)


def test_export_feeds_torch_model_forward():
    """The deploy direction: our params drive the torch reference exactly."""
    ours = jm.MLPMixerForImageClassification(use_pallas=False, seed=7,
                                             **MIXER_KW)
    ref = ref_model("mlp_mixer", "MLPMixerForImageClassification", **MIXER_KW)
    missing = ref.load_state_dict(ours.export_torch_state_dict(), strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys
    ref.eval()

    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(
        np.float32
    )
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()
    from jittor_mlp_tpu import config

    with config.parity_mode():
        mine = np.asarray(ours(x))
    assert np.abs(mine - theirs).max() < 1e-4


def test_export_bn_model_with_buffers():
    """WaveMLP: BN running stats roundtrip and num_batches_tracked is
    re-synthesized so strict torch loading works."""
    WAVE_XS = [[1, 1, 1, 1], [2, 2, 2, 2]]
    load_ref("wave_mlp").wavemlp_settings["XS"] = WAVE_XS
    jm_wave.wavemlp_settings["XS"] = WAVE_XS
    ref = ref_model("wave_mlp", "WaveMLP", model_name="XS", num_classes=10)
    ours = jm.WaveMLP(model_name="XS", num_classes=10)
    sd0 = {k: v.numpy() for k, v in ref.state_dict().items()}
    ours.load_torch_state_dict(sd0)
    sd1 = ours.export_torch_state_dict(tensors=False)
    for k, v in sd0.items():
        if k.endswith("num_batches_tracked"):
            assert k in sd1  # re-synthesized buffer
            continue
        np.testing.assert_allclose(sd1[k], v, rtol=0, atol=0, err_msg=k)
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd1.items()},
        strict=True,
    )
    assert not res.missing_keys and not res.unexpected_keys


def test_export_lstm_and_reparam_models_smoke():
    """Sequencer (LSTM weight relayout) and RepMLPNet (grouped fc3): the
    traced inverse map must fully recover every torch tensor."""
    import jittor_mlp_tpu.models.sequencer as jm_seq

    SEQ_XS = [[1, 1], [16, 32], [8, 8], 2]
    load_ref("sequencer").sequencer_settings["XS"] = SEQ_XS
    jm_seq.sequencer_settings["XS"] = SEQ_XS
    ref = ref_model("sequencer", "Sequencer2D", model_name="XS",
                    num_classes=10)
    ours = jm.Sequencer2D(model_name="XS", num_classes=10)
    sd0 = {k: v.numpy() for k, v in ref.state_dict().items()}
    ours.load_torch_state_dict(sd0)
    sd1 = ours.export_torch_state_dict(tensors=False)
    for k, v in sd0.items():
        np.testing.assert_allclose(sd1[k], v, rtol=0, atol=0, err_msg=k)

    rep = jm.create_RepMLPNet_B224(num_class=4)
    sd = rep.export_torch_state_dict(tensors=False, strict=True)
    assert len(sd) > 50  # every tensor recovered without unmapped spans
