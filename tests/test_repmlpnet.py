import numpy as np
import torch

import jittor_mlp_tpu as jm
from conftest import assert_close
from parity import check_parity
from ref_loader import ref_model

CFG = dict(
    in_channels=3,
    num_class=10,
    patch_size=(2, 2),
    num_blocks=(1, 2),
    channels=(8, 16),
    hs=(4, 2),
    ws=(4, 2),
    sharesets_nums=(2, 4),
    reparam_conv_k=(1, 3),
)


def test_repmlpnet_parity():
    check_parity(
        "repmlpnet",
        "RepMLPNet",
        jm.models.repmlpnet.RepMLPNet,
        dict(CFG),
        input_shape=(2, 3, 16, 16),
    )


def test_repmlpnet_deploy_parity():
    check_parity(
        "repmlpnet",
        "RepMLPNet",
        jm.models.repmlpnet.RepMLPNet,
        dict(CFG, deploy=True),
        input_shape=(2, 3, 16, 16),
    )


def test_locality_injection_equivalence():
    """Mirrors the commented equivalence check (repmlpnet.py:285-297):
    outputs before and after folding must match, and must match the torch
    model after its own local_inject()."""
    ref = ref_model("repmlpnet", "RepMLPNet", **CFG)
    ours = jm.models.repmlpnet.RepMLPNet(**CFG)
    ours.load_torch_state_dict(ref.state_dict())

    x = np.random.default_rng(0).standard_normal((2, 3, 16, 16)).astype("float32")
    from jittor_mlp_tpu import config

    with config.parity_mode():
        before = np.asarray(ours(x))
        ours.locality_injection()
        after = np.asarray(ours(x))
    assert_close(after, before, tol=1e-4, name="inject self-consistency")

    ref.locality_injection()
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    assert_close(after, want, tol=1e-4, name="inject vs torch local_inject")


def test_b224_factory_builds():
    m = jm.create_RepMLPNet_B224()
    assert m.param_count() > 1e7
