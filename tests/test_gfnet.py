import jittor_mlp_tpu as jm
from parity import check_parity


def test_gfnet_parity():
    check_parity(
        "gfnet",
        "GFNet",
        jm.GFNet,
        dict(img_size=32, patch_size=8, num_classes=10, embed_dim=32, depth=3),
        input_shape=(2, 3, 32, 32),
    )


def test_gfnet_pre_logits():
    """The reference's representation_size path is broken (gfnet.py:245-261
    never applies pre_logits, so its head crashes on a dim mismatch). Ours
    applies pre_logits as documented; assert it runs and the reference crashes."""
    import numpy as np
    import pytest
    import torch
    from ref_loader import ref_model

    m = jm.GFNet(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                 depth=2, representation_size=24)
    out = m(np.zeros((2, 3, 32, 32), np.float32))
    assert out.shape == (2, 10)

    ref = ref_model("gfnet", "GFNet", img_size=32, patch_size=8, num_classes=10,
                    embed_dim=32, depth=2, representation_size=24)
    with pytest.raises(RuntimeError):
        with torch.no_grad():
            ref(torch.zeros(2, 3, 32, 32))


def test_gfnet_pyramid_parity():
    check_parity(
        "gfnet",
        "GFNetPyramid",
        jm.GFNetPyramid,
        dict(img_size=32, patch_size=4, num_classes=10,
             embed_dim=[16, 32, 48, 64], depth=[1, 1, 2, 1]),
        input_shape=(2, 3, 32, 32),
    )


def test_gfnet_pyramid_no_layerscale_parity():
    check_parity(
        "gfnet",
        "GFNetPyramid",
        jm.GFNetPyramid,
        dict(img_size=32, patch_size=4, num_classes=10,
             embed_dim=[16, 32, 48, 64], depth=[1, 1, 1, 1], no_layerscale=True),
        input_shape=(2, 3, 32, 32),
    )
