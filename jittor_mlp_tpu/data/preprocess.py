"""On-device image preprocessing pipeline (jit-compiled).

The reference has no input pipeline at all (SURVEY §0: benchmark feeds
torch.rand); the BASELINE north-star asks for resize/normalize/patchify as a
jitted on-device pipeline feeding batched inference. uint8 batches upload at a
quarter of the f32 byte volume — significant on hosts where the device link is
the bottleneck — and all arithmetic runs on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_bilinear(x, size):
    """x: (B, H, W, C) any dtype → (B, size, size, C) float32, half-pixel
    centers (torch align_corners=False semantics)."""
    B, H, W, C = x.shape
    s = (size, size) if isinstance(size, int) else size
    return jax.image.resize(x.astype(jnp.float32), (B, *s, C), method="bilinear")


def normalize(x, mean=IMAGENET_MEAN, std=IMAGENET_STD, scale=1.0 / 255.0):
    """uint8/float (B, H, W, C) → standardized float: (x*scale - mean) / std."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x.astype(jnp.float32) * scale - mean) / std


def patchify(x, patch_size):
    """(B, H, W, C) → (B, H/p * W/p, p*p*C) token sequence (static reshapes)."""
    p = patch_size
    B, H, W, C = x.shape
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def make_preprocess(image_size=224, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                    dtype=jnp.float32, layout="NCHW"):
    """Jitted uint8-HWC-batch → model-input pipeline.

    Returns fn(batch_u8: (B, H, W, 3) uint8) → (B, 3, S, S) (or NHWC) ``dtype``.
    Resize happens on device only when the input size differs.
    """

    @jax.jit
    def pipeline(batch):
        x = batch
        if x.shape[1] != image_size or x.shape[2] != image_size:
            x = resize_bilinear(x, image_size)
        x = normalize(x, mean, std)
        if layout == "NCHW":
            x = jnp.transpose(x, (0, 3, 1, 2))
        return x.astype(dtype)

    return pipeline
