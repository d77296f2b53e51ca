"""Preprocessing pipeline: on-device jit path and native C++ host loader."""
import numpy as np

from jittor_mlp_tpu.data import make_preprocess, normalize, patchify
from jittor_mlp_tpu.data import loader


def test_on_device_pipeline():
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (4, 300, 300, 3), dtype=np.uint8)
    pipe = make_preprocess(image_size=224)
    out = np.asarray(pipe(batch))
    assert out.shape == (4, 3, 224, 224)
    # standardized stats roughly centered
    assert abs(out.mean()) < 1.0 and 0.5 < out.std() < 3.0


def test_patchify_matches_conv_patchify():
    import jax.numpy as jnp

    from jittor_mlp_tpu.core import nnf

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 3, 4, 4)), jnp.float32)
    via_conv = nnf.patch_embed({"weight": w}, x, 4).reshape(2, 4, 5)
    tokens = patchify(jnp.transpose(x, (0, 3, 1, 2)).transpose(0, 2, 3, 1), 4)
    # token layout (p,p,C) vs conv's (C,p,p): check through matching weights
    wm = w.reshape(5, 3, 16).transpose(0, 2, 1).reshape(5, 48)  # (O, p*p*C)
    via_tokens = tokens @ wm.T
    np.testing.assert_allclose(
        np.asarray(via_tokens), np.asarray(via_conv), rtol=1e-4, atol=1e-5
    )


def test_native_loader_matches_numpy():
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    got = loader.normalize_batch(imgs, mean, std)
    want = (imgs.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    want = want.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert loader.native_available(), "C++ fastloader failed to build"


def test_native_resize_matches_torch_interpolate():
    # the native loader implements torch F.interpolate(bilinear,
    # align_corners=False) semantics (no antialias); jax.image.resize
    # anti-aliases on downscale, so torch is the comparison point
    import torch

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (2, 48, 64, 3), dtype=np.uint8)
    got = loader.resize_batch(imgs, 32).astype(np.float32)
    t = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).float()
    want = torch.nn.functional.interpolate(
        t, size=(32, 32), mode="bilinear", align_corners=False
    ).numpy().transpose(0, 2, 3, 1)
    assert np.abs(got - want).max() <= 1.0 + 1e-3  # uint8 rounding


def test_host_loader_end_to_end():
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (2, 300, 300, 3), dtype=np.uint8)
    hl = loader.HostLoader(image_size=224)
    out = hl(imgs)
    assert out.shape == (2, 3, 224, 224) and out.dtype == np.float32


def test_image_folder_dataset_and_iterator(tmp_path):
    from PIL import Image

    from jittor_mlp_tpu.data import BatchIterator, ImageFolderDataset

    rng = np.random.default_rng(5)
    for ci, cls in enumerate(["cat", "dog"]):
        d = tmp_path / cls
        d.mkdir()
        for j in range(3):
            arr = rng.integers(0, 256, (40 + 10 * j, 50, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{j}.png")

    ds = ImageFolderDataset(str(tmp_path), decode_size=32)
    assert len(ds) == 6 and ds.classes == ["cat", "dog"]
    img, label = ds.get(0)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8 and label == 0

    it = BatchIterator(ds, batch_size=4, seed=1, drop_last=True)
    batches = list(it)
    assert len(batches) == 1  # 6 // 4
    b = batches[0]
    assert b["image"].shape == (4, 32, 32, 3)
    assert b["label"].shape == (4,) and b["label"].dtype == np.int32
    # a fresh epoch reshuffles
    assert len(list(it)) == 1


def test_on_device_augment():
    import jax

    from jittor_mlp_tpu.data import make_augment

    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 256, (4, 40, 40, 3), dtype=np.uint8)
    aug = make_augment(image_size=32)
    out = np.asarray(aug(jax.random.PRNGKey(0), imgs))
    assert out.shape == (4, 3, 32, 32) and np.isfinite(out).all()
    # crops genuinely vary across rng keys
    out2 = np.asarray(aug(jax.random.PRNGKey(1), imgs))
    assert np.abs(out - out2).max() > 0

    # every crop is an exact window of the normalized source
    x = imgs[0].astype(np.float32) / 255.0
    x = (x - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    got0 = out[0].transpose(1, 2, 0)
    found = any(
        np.allclose(got0, win, atol=1e-5) or np.allclose(got0, win[:, ::-1], atol=1e-5)
        for top in range(9) for left in range(9)
        for win in [x[top:top + 32, left:left + 32]]
    )
    assert found, "augmented image 0 is not a crop/flip of the source"


def test_augment_feeds_train_step():
    import jax
    import jax.numpy as jnp
    import optax

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu.data import ArrayDataset, BatchIterator, make_augment
    from jittor_mlp_tpu.parallel.train import make_train_step, split_params

    rng = np.random.default_rng(7)
    ds = ArrayDataset(
        rng.integers(0, 256, (8, 20, 20, 3), dtype=np.uint8),
        rng.integers(0, 4, (8,)),
    )
    model = jm.MLPMixerForImageClassification(
        d_model=16, depth=1, patch_size=4, image_size=16, num_classes=4,
        use_pallas=False,
    )
    opt = optax.sgd(0.1)
    train, _, _, _ = split_params(model.params)
    opt_state = opt.init(train)
    step = make_train_step(model.apply, opt)
    aug = make_augment(image_size=16)
    params = model.params
    key = jax.random.PRNGKey(0)
    for batch in BatchIterator(ds, batch_size=4, prefetch=1):
        key, k1, k2 = jax.random.split(key, 3)
        b = {"image": aug(k1, batch["image"]),
             "label": jnp.asarray(batch["label"])}
        params, opt_state, loss = step(params, opt_state, b, k2)
        assert np.isfinite(float(loss))


def _smooth_img(h, w, seed):
    # smooth gradients: JPEG is lossy and the native resize is bilinear vs
    # PIL's bicubic, so high-frequency noise would conflate filter error
    # with decode error
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 127 + 100 * np.sin(yy / h * 3 + seed)
    g = 127 + 100 * np.cos(xx / w * 4 - seed)
    b = (yy / h + xx / w) * 120
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def test_native_decode_matches_pil(tmp_path):
    import pytest
    from PIL import Image

    from jittor_mlp_tpu.data import ImageFolderDataset

    if not loader.decode_available():
        pytest.skip("native decoder unavailable")

    d = tmp_path / "c"
    d.mkdir()
    shapes = [("jpg", 90, 70), ("jpg", 41, 67), ("png", 64, 48), ("png", 33, 33)]
    for j, (fmt, h, w) in enumerate(shapes):
        Image.fromarray(_smooth_img(h, w, j)).save(d / f"{j}.{fmt}", quality=95)

    ds = ImageFolderDataset(str(tmp_path), decode_size=32)
    batch, labels = ds.get_batch(list(range(len(ds))))
    assert batch.shape == (4, 32, 32, 3) and batch.dtype == np.uint8
    assert labels.tolist() == [0, 0, 0, 0]
    for i in range(len(ds)):
        ref, _ = ds.get(i)  # the PIL path
        diff = np.abs(batch[i].astype(int) - ref.astype(int)).mean()
        assert diff < 8, f"image {i}: native-vs-PIL mean abs {diff}"


def test_native_decode_fallback_containers(tmp_path):
    from PIL import Image

    from jittor_mlp_tpu.data import ImageFolderDataset

    d = tmp_path / "c"
    d.mkdir()
    # bmp is outside the native decoder's containers; it must flag the image
    # and serve it through the PIL fallback inside the same batch
    Image.fromarray(_smooth_img(48, 40, 0)).save(d / "a.bmp")
    Image.fromarray(_smooth_img(52, 44, 1)).save(d / "b.png")

    ds = ImageFolderDataset(str(tmp_path), decode_size=24)
    batch, labels = ds.get_batch([0, 1])
    assert batch.shape == (2, 24, 24, 3)
    ref, _ = ds.get(0)
    np.testing.assert_array_equal(batch[0], ref)


def test_native_decode_rgba_falls_back_to_pil(tmp_path):
    """Alpha PNGs decode differently under libpng's compositing vs PIL's
    convert('RGB') (which drops alpha) — the native path must punt them to
    the PIL fallback so both paths yield identical pixels."""
    from PIL import Image

    from jittor_mlp_tpu.data import ImageFolderDataset

    d = tmp_path / "c"
    d.mkdir()
    rgb = _smooth_img(48, 40, 3)
    rgba = np.concatenate(
        [rgb, np.full((48, 40, 1), 128, np.uint8)], axis=-1
    )
    Image.fromarray(rgba, "RGBA").save(d / "a.png")

    ds = ImageFolderDataset(str(tmp_path), decode_size=24)
    batch, _ = ds.get_batch([0])
    ref, _ = ds.get(0)
    np.testing.assert_array_equal(batch[0], ref)
