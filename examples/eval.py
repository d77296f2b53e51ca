"""Evaluation: top-1/top-5 accuracy of any zoo model over an ImageFolder tree.

Closes the train/serve/eval triad: batches stream through the host decode
pipeline, preprocessing and the forward run jitted on device, and only the
(B, 5) top-k indices cross the host link per batch.

  python examples/eval.py --model convmlp_s --data-dir /path/to/val \
      [--checkpoint weights.pth | weights.npz | weights.int8.npz] [--bf16]

Synthetic smoke (no dataset needed):
  python examples/eval.py --cpu --synthetic --image-size 32
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_weights(model, path, bf16=False):
    if path.endswith(".pth") or path.endswith(".pt"):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        model.load_torch_state_dict(sd)
    elif path.endswith(".int8.npz"):
        import jax.numpy as jnp

        from jittor_mlp_tpu.quant import load_quantized

        # dequantize to the dtype the eval path actually runs in — without
        # this an f32 eval silently ran on bf16 weights
        load_quantized(model, path,
                       dtype=jnp.bfloat16 if bf16 else jnp.float32)
    else:
        from jittor_mlp_tpu.utils.serialization import load_params

        load_params(model, path)
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="MLPMixerForImageClassification")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--classes", type=int, default=1000)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu import config
    from jittor_mlp_tpu.data import BatchIterator, ImageFolderDataset
    from jittor_mlp_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

    config.enable_compile_cache()

    if args.model == "MLPMixerForImageClassification":
        kwargs = dict(image_size=args.image_size, patch_size=8, d_model=128,
                      depth=6, num_classes=args.classes)
    else:
        from jittor_mlp_tpu.utils import sized_kwargs

        kwargs = sized_kwargs(getattr(jm, args.model),
                              image_size=args.image_size,
                              num_classes=args.classes)
    model = getattr(jm, args.model)(**kwargs).eval()
    if args.checkpoint:
        load_weights(model, args.checkpoint, bf16=args.bf16)
    if args.bf16:
        model.to_bf16()
    print(f"{args.model}: {model.param_count():,} params")

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    @jax.jit
    def eval_batch(params, images_u8, labels):
        x = images_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        x = jnp.transpose(x, (0, 3, 1, 2)).astype(dtype)
        logits = model.apply(params, x).astype(jnp.float32)
        top5 = jax.lax.top_k(logits, 5)[1]
        hit1 = (top5[:, 0] == labels).sum()
        hit5 = (top5 == labels[:, None]).any(-1).sum()
        return hit1, hit5

    if args.synthetic:
        rng = np.random.default_rng(0)
        batches = (
            {
                "image": rng.integers(0, 255, (args.batch, args.image_size,
                                               args.image_size, 3),
                                      dtype=np.uint8),
                "label": rng.integers(0, args.classes, args.batch,
                                      dtype=np.int64),
            }
            for _ in range(3)
        )
    else:
        assert args.data_dir, "--data-dir required (or use --synthetic)"
        ds = ImageFolderDataset(args.data_dir, decode_size=args.image_size)
        batches = BatchIterator(ds, args.batch, shuffle=False,
                                drop_last=False)

    n = hit1 = hit5 = 0
    t0 = time.time()
    for b in batches:
        imgs = b["image"]
        if imgs.shape[0] < args.batch:  # pad the ragged tail
            pad = args.batch - imgs.shape[0]
            imgs = np.concatenate([imgs, np.zeros((pad, *imgs.shape[1:]),
                                                  imgs.dtype)])
            labels = np.concatenate([b["label"], np.full(pad, -1)])
        else:
            labels = b["label"]
        h1, h5 = eval_batch(model.params, jnp.asarray(imgs),
                            jnp.asarray(labels.astype(np.int32)))
        valid = int((labels >= 0).sum())
        n += valid
        hit1 += int(h1)
        hit5 += int(h5)
    dt = time.time() - t0
    print(f"top-1 {hit1 / n:.4f}  top-5 {hit5 / n:.4f}  "
          f"({n} images, {n / dt:,.0f} img/s end-to-end)")


if __name__ == "__main__":
    main()
