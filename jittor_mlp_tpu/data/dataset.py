"""Dataset ingestion: folder datasets, shuffled prefetching iterators, and
jit-compiled on-device augmentation.

The reference trains nothing and ships no input pipeline (SURVEY.md §0); this
closes the framework-completeness gap so the trainer (parallel/train.py) can
consume real images end-to-end:

- ImageFolderDataset: torchvision-style class-per-subdirectory image tree,
  decoded on the host to uint8 HWC at a fixed size — batches ride the native
  threaded JPEG/PNG decoder (data/native/decode.cpp) with per-image PIL
  fallback for anything it can't handle.
- ArrayDataset: in-memory uint8 images + labels.
- BatchIterator: epoch shuffling + background-thread prefetch producing
  pinned numpy batches {'image': u8 NHWC, 'label': i32}; decode/resize ride
  the native C++ loader (data/loader.py) when built.
- make_augment: jit-compiled random-crop + horizontal-flip + normalize +
  NHWC→NCHW on device — uploads stay uint8 (quarter bandwidth), all
  per-pixel math runs on the chip.
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

import jax
import jax.numpy as jnp

from .loader import resize_batch
from .preprocess import IMAGENET_MEAN, IMAGENET_STD

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ArrayDataset:
    """In-memory dataset of uint8 HWC images and integer labels."""

    def __init__(self, images_u8, labels):
        self.images = np.asarray(images_u8, np.uint8)
        self.labels = np.asarray(labels, np.int32)
        assert len(self.images) == len(self.labels)

    def __len__(self):
        return len(self.images)

    def get(self, idx):
        return self.images[idx], self.labels[idx]


class ImageFolderDataset:
    """Class-per-subdirectory image tree (the torchvision ImageFolder layout).

    Images decode on the host with PIL and resize to ``decode_size`` (square)
    uint8 HWC at access time; pair with BatchIterator for shuffling/prefetch
    and make_augment for on-device random crops down to the model size.
    """

    def __init__(self, root, decode_size=256):
        self.root = root
        self.decode_size = decode_size
        self.classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples = []
        for c in self.classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(_IMG_EXTS):
                    self.samples.append(
                        (os.path.join(cdir, fn), self.class_to_idx[c])
                    )
        if not self.samples:
            raise ValueError(f"no images under {root}")

    def __len__(self):
        return len(self.samples)

    def get_batch(self, idxs):
        """Decode a batch on the native C++ thread pool (data/native/
        decode.cpp: libjpeg scaled decode + libpng, shorter-side resize +
        center crop — same geometry as get()); images the native path can't
        handle (bmp/webp/CMYK/corrupt) fall back to PIL per image."""
        from .loader import decode_available, decode_batch

        if not decode_available():
            imgs, labels = zip(*(self.get(i) for i in idxs))
            return np.stack(imgs), np.asarray(labels, np.int32)
        buffers = []
        labels = []
        for i in idxs:
            path, label = self.samples[i]
            with open(path, "rb") as f:
                buffers.append(f.read())
            labels.append(label)
        batch, fail = decode_batch(buffers, self.decode_size)
        for j in np.nonzero(fail)[0]:
            batch[j] = self.get(idxs[j])[0]
        return batch, np.asarray(labels, np.int32)

    def get(self, idx):
        from PIL import Image

        path, label = self.samples[idx]
        with Image.open(path) as im:
            im = im.convert("RGB")
            s = self.decode_size
            # shorter-side resize then center pad/crop to square, host-side
            w, h = im.size
            scale = s / min(w, h)
            im = im.resize(
                (max(s, round(w * scale)), max(s, round(h * scale)))
            )
            arr = np.asarray(im, np.uint8)
        top = (arr.shape[0] - s) // 2
        left = (arr.shape[1] - s) // 2
        return arr[top:top + s, left:left + s], np.int32(label)


class BatchIterator:
    """Shuffled, prefetching batch iterator over a dataset.

    Yields {'image': uint8 (B, S, S, 3) NHWC, 'label': int32 (B,)} numpy
    batches; a background thread keeps ``prefetch`` batches decoded ahead.
    """

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 drop_last=True, prefetch=2, resize_to=None):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.resize_to = resize_to
        self._rng = np.random.default_rng(seed)

    def _epoch_order(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            self._rng.shuffle(order)
        return order

    def _assemble(self, idxs):
        if hasattr(self.ds, "get_batch"):
            batch, labels = self.ds.get_batch(idxs)
        else:
            imgs, labels = zip(*(self.ds.get(i) for i in idxs))
            batch = np.stack(imgs)
        if self.resize_to and batch.shape[1] != self.resize_to:
            batch = resize_batch(batch, self.resize_to)
        return {"image": batch, "label": np.asarray(labels, np.int32)}

    def __iter__(self):
        order = self._epoch_order()
        n = len(order)
        ends = range(self.batch_size, n + 1, self.batch_size)
        chunks = [order[e - self.batch_size:e] for e in ends]
        if not self.drop_last and n % self.batch_size:
            chunks.append(order[-(n % self.batch_size):])

        q = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for c in chunks:
                    q.put(self._assemble(c))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item


def make_augment(image_size=224, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                 flip=True, to_nchw=True):
    """jit-compiled train-time augmentation on device.

    fn(rng, images_u8_nhwc) -> float NCHW batch: per-image random crop from
    the decoded size down to ``image_size`` (dynamic_slice, no gathers),
    random horizontal flip, /255 + mean/std normalize. Upload stays uint8.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    @jax.jit
    def augment(rng, images):
        B, H, W, C = images.shape
        r_top, r_left, r_flip = jax.random.split(rng, 3)
        tops = jax.random.randint(r_top, (B,), 0, H - image_size + 1)
        lefts = jax.random.randint(r_left, (B,), 0, W - image_size + 1)
        flips = jax.random.bernoulli(r_flip, 0.5, (B,)) if flip else None

        def one(img, top, left, fl):
            crop = jax.lax.dynamic_slice(
                img, (top, left, 0), (image_size, image_size, C)
            )
            if flip:
                crop = jax.lax.cond(
                    fl, lambda c: c[:, ::-1, :], lambda c: c, crop
                )
            return crop

        crops = jax.vmap(one)(
            images, tops, lefts,
            flips if flip else jnp.zeros((B,), jnp.bool_),
        )
        x = crops.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        if to_nchw:
            x = jnp.transpose(x, (0, 3, 1, 2))
        return x

    return augment
