"""Batched inference serving for zoo models.

The north-star deployment target is batched serving on TPU; the reference has
no serving surface at all (SURVEY §1: no serving/CLI layer). Predictor wraps
any zoo Model with the production plumbing XLA wants:

- fixed-shape batching: requests pad up to ``batch_size`` so the jitted
  forward compiles once (no dynamic shapes, no recompiles);
- uint8 NHWC ingestion with on-device resize/normalize (uploads stay at
  quarter bandwidth; per-pixel math runs on chip);
- bf16 weights/activations with an fp32 softmax head, top-k decoded on
  device so only (B, k) scalars cross the host link (device→host transfers
  are the bottleneck on tunneled runtimes).

    p = Predictor(jm.MLPMixerForImageClassification(), batch_size=8)
    labels, probs = p.predict(images_u8)   # (N, k) each, N ≤ batch_size
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from .data.preprocess import IMAGENET_MEAN, IMAGENET_STD


class Predictor:
    def __init__(self, model, batch_size=8, image_size=224, top_k=5,
                 bf16=True, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                 preprocess=True, weights=None, compute=None):
        """weights="int8": ship weights to the device as per-channel int8
        (quarter of the fp32 bytes over the host link) and dequantize on
        device to the compute dtype — see quant.py for the error bound.

        compute="int8": run every dense contraction as dynamic W8A8 int8
        (config.int8_mode) — the TPU MXU executes int8 at 2× its bf16 FLOP
        rate; accuracy bounds in tests/test_int8.py."""
        self.model = model.eval()
        if weights == "int8":
            from .quant import dequantize_tree, quantize_tree

            q = quantize_tree(jax.tree.map(np.asarray, self.model.params))
            self.model.params = dequantize_tree(
                q, jnp.bfloat16 if bf16 else jnp.float32
            )
        elif weights is not None:
            raise ValueError(f"unknown weights option {weights!r}")
        if compute not in (None, "int8"):
            raise ValueError(f"unknown compute option {compute!r}")
        if bf16:
            self.model.to_bf16()
        self.batch_size = batch_size
        self.image_size = image_size
        self.top_k = top_k
        self._mean = jnp.asarray(mean, jnp.float32)
        self._std = jnp.asarray(std, jnp.float32)
        self._preprocess = preprocess
        params = self.model.params
        apply = self.model.apply
        dtype = jnp.bfloat16 if bf16 else jnp.float32

        def fwd(params, images):
            if preprocess:
                x = images.astype(jnp.float32) / 255.0
                x = (x - self._mean) / self._std
                if x.shape[1] != image_size:
                    x = jax.image.resize(
                        x,
                        (x.shape[0], image_size, image_size, x.shape[3]),
                        method="bilinear",
                    )
                x = jnp.transpose(x, (0, 3, 1, 2))
            else:
                x = images
            if compute == "int8":
                # trace-time flag: the jit trace of this fwd routes every
                # nnf dense op through quant.dynamic_int8_matmul
                from . import config as _cfg

                old = _cfg.int8_matmul
                _cfg.int8_matmul = True
                try:
                    logits = apply(params, x.astype(dtype)).astype(jnp.float32)
                finally:
                    _cfg.int8_matmul = old
            else:
                logits = apply(params, x.astype(dtype)).astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            top = jax.lax.top_k(probs, top_k)
            return top[1], top[0]  # (indices, probabilities)

        self._fwd = jax.jit(fwd)
        self._params = params
        # per-request wall-clock ring buffer (seconds); sized for steady
        # percentile estimates without unbounded growth
        self._lat = np.zeros(1024, np.float64)
        self._lat_n = 0

    def warmup(self):
        """Compile the serving graph ahead of traffic."""
        if self._preprocess:
            dummy = np.zeros(
                (self.batch_size, self.image_size, self.image_size, 3),
                np.uint8,
            )
        else:
            dummy = np.zeros(
                (self.batch_size, 3, self.image_size, self.image_size),
                np.float32,
            )
        self.predict(dummy)
        return self

    def predict(self, images):
        """images: uint8 NHWC (preprocess=True) or float NCHW. N ≤ batch_size
        (padded internally to the compiled shape). Returns (labels, probs),
        both (N, top_k) numpy arrays."""
        images = np.asarray(images)
        n = images.shape[0]
        if n > self.batch_size:
            raise ValueError(
                f"request of {n} exceeds batch_size={self.batch_size}; "
                f"split upstream or build a larger Predictor"
            )
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n, *images.shape[1:]),
                           images.dtype)
            images = np.concatenate([images, pad])
        t0 = time.perf_counter()
        idx, probs = self._fwd(self._params, jnp.asarray(images))
        out = np.asarray(idx)[:n], np.asarray(probs)[:n]
        # np.asarray above is the device sync, so the stopwatch covers
        # upload + forward + top-k download: the end-to-end request time
        self._lat[self._lat_n % self._lat.size] = time.perf_counter() - t0
        self._lat_n += 1
        return out

    def latency_stats(self):
        """Request-latency percentiles over the recent window (up to the
        last 1024 ``predict`` calls, warmup/compile call included until it
        rotates out). Returns {} before any request; times in ms."""
        n = min(self._lat_n, self._lat.size)
        if n == 0:
            return {}
        w = np.sort(self._lat[:n]) * 1000.0
        q = lambda p: float(w[min(int(p * n), n - 1)])
        return {
            "count": self._lat_n,
            "mean_ms": float(w.mean()),
            "p50_ms": q(0.50),
            "p95_ms": q(0.95),
            "p99_ms": q(0.99),
            "max_ms": float(w[-1]),
        }
