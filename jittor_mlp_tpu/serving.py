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

import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from .data.preprocess import IMAGENET_MEAN, IMAGENET_STD


class Predictor:
    def __init__(self, model, batch_size=8, image_size=224, top_k=5,
                 bf16=None, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                 preprocess=True, weights=None, compute=None):
        """bf16=None (default): resolve the serving dtype from the measured
        per-model recommendation in ``tuned.SERVE`` (tools/gen_tuned.py,
        derived from serving_sweep.jsonl / PARITY_BF16.md). That picks f32
        for s2_mlp_v2 (bf16 argmax agreement 72% vs its own f32 forward —
        the softmax-gate amplification analyzed in PARITY_BF16.md), dynamic
        int8 only where it measurably beats bf16 without losing argmax
        agreement (mlp_mixer), and bf16 everywhere else. Pass bf16=True /
        bf16=False (or compute=) to override; unswept custom models default
        to bf16. ``self.dtype`` records the resolved choice.

        weights="int8": ship weights to the device as per-channel int8
        (quarter of the fp32 bytes over the host link) and dequantize on
        device to the compute dtype — see quant.py for the error bound.

        compute="int8": run every dense contraction as dynamic W8A8 int8
        (config.int8_mode) — the TPU MXU executes int8 at 2× its bf16 FLOP
        rate; accuracy bounds in tests/test_int8.py."""
        self.model = model.eval()
        if bf16 is None:
            from .tuned import serve_settings

            rec = serve_settings(getattr(model, "name", None))
            choice = rec["dtype"] if rec else "bf16"
            bf16 = choice != "f32"
            if choice == "int8" and compute is None and weights is None:
                compute = "int8"
        self.dtype = ("int8" if compute == "int8"
                      else "bf16" if bf16 else "f32")
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
        # percentile estimates without unbounded growth. Locked: predict
        # may run concurrently from MicroBatcher's executor pool.
        self._lat = np.zeros(1024, np.float64)
        self._lat_n = 0
        self._lat_lock = threading.Lock()

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
        dt = time.perf_counter() - t0
        with self._lat_lock:
            self._lat[self._lat_n % self._lat.size] = dt
            self._lat_n += 1
        return out

    def latency_stats(self):
        """Request-latency percentiles over the recent window (up to the
        last 1024 ``predict`` calls, warmup/compile call included until it
        rotates out). Returns {} before any request; times in ms."""
        with self._lat_lock:
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


class _Pending:
    __slots__ = ("image", "event", "result", "error", "t0")

    def __init__(self, image):
        self.image = image
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.t0 = time.perf_counter()


class MicroBatcher:
    """Deadline-based request coalescing in front of a Predictor.

    LATENCY.md measures what batch-1 serving leaves on the table: per
    family, the chip's batch-64 throughput is 1.6-8.3x the batch-1 rate
    (res_mlp 3.0x, wave_mlp 8.3x). Under concurrent traffic the fix is
    the classic deadline micro-batcher of production model servers:
    ``submit`` blocks the calling thread while a dispatcher packs queued
    requests into one fixed-shape padded ``Predictor.predict`` the moment
    the batch fills or the oldest request has waited ``max_delay_ms``.
    The compiled graph never sees a new shape, and per-request results
    are bit-identical to the unbatched ones — every zoo model is
    per-sample independent in eval mode (LN normalizes per sample, BN
    uses running stats; asserted in tests/test_microbatch.py).

        batcher = MicroBatcher(Predictor(model, batch_size=16))
        labels, probs = batcher.submit(image)   # (k,), (k,) for ONE image

    ``in_flight`` pipelines dispatched batches through a small executor
    pool instead of running them one-by-one in the dispatcher: on this
    tunneled runtime each predict pays a ~50 ms host↔device round trip
    *independent of batch size* (measured: b1/b4/b16 all ≈ 50-55 ms), so
    a synchronous dispatcher caps at ~20 batches/s no matter how well it
    coalesces. Keeping a few padded batches in flight overlaps those
    round trips; on a local (untunneled) runtime the same knob overlaps
    host packing with device execution. Rule of thumb: in_flight ≈
    round-trip time / per-batch device time (tunneled runtimes want
    8-16, a local host 2-4; measured A/B in tools/serving_bench.py).
    Per-request results don't depend on which in-flight batch a request
    lands in.

    The reference has no serving surface at all (SURVEY §1); this is the
    deployment layer a TPU chip actually needs to hit its roofline on
    request-sized traffic.
    """

    def __init__(self, predictor, max_delay_ms=2.0, in_flight=4):
        from concurrent.futures import ThreadPoolExecutor

        self.predictor = predictor
        self.max_delay = max_delay_ms / 1e3
        self._cv = threading.Condition()
        self._queue = []
        self._stopped = False
        self._shape = None  # fixed per-image shape, set by the first submit
        # batch-occupancy histogram: _fills[n] = batches dispatched with n
        # requests; mean fill is the utilization the deadline recovered
        self._fills = np.zeros(predictor.batch_size + 1, np.int64)
        self._batches = 0
        self._requests = 0
        self._stats_lock = threading.Lock()
        self._pool = ThreadPoolExecutor(
            max_workers=max(1, in_flight), thread_name_prefix="microbatch"
        )
        self._worker = threading.Thread(
            target=self._run, name="microbatcher", daemon=True
        )
        self._worker.start()

    def submit(self, image):
        """Classify ONE image; blocks until its coalesced batch returns.

        image: (H, W, C) uint8 when the Predictor preprocesses, else the
        float layout its compiled forward expects. All submissions must
        share one shape (the batch is a fixed-shape stack); a mismatch
        raises here, in the caller, without poisoning the in-flight batch.
        Returns (labels, probs), each a (top_k,) numpy array.
        """
        image = np.asarray(image)
        p = _Pending(image)
        with self._cv:
            if self._stopped:
                raise RuntimeError("MicroBatcher is closed")
            if self._shape is None:
                self._shape = image.shape
            elif image.shape != self._shape:
                raise ValueError(
                    f"image shape {image.shape} != batch shape "
                    f"{self._shape}; resize upstream (the serving batch "
                    f"is one fixed-shape stack)"
                )
            self._queue.append(p)
            self._cv.notify_all()
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.result

    def _run(self):
        cap = self.predictor.batch_size
        while True:
            with self._cv:
                while not self._queue and not self._stopped:
                    self._cv.wait()
                if not self._queue and self._stopped:
                    return
                # the oldest request's deadline bounds everyone's wait
                deadline = self._queue[0].t0 + self.max_delay
                while len(self._queue) < cap and not self._stopped:
                    remaining = deadline - time.perf_counter()
                    if remaining <= 0:
                        break
                    self._cv.wait(remaining)
                batch = self._queue[:cap]
                del self._queue[:cap]
            self._pool.submit(self._execute, batch)

    def _execute(self, batch):
        try:
            labels, probs = self.predictor.predict(
                np.stack([p.image for p in batch])
            )
            for i, p in enumerate(batch):
                p.result = (labels[i], probs[i])
        except Exception as e:  # surface in every waiting caller
            for p in batch:
                p.error = e
        with self._stats_lock:
            self._batches += 1
            self._requests += len(batch)
            self._fills[len(batch)] += 1
        for p in batch:
            p.event.set()

    def stats(self):
        """Batching effectiveness: dispatched batches, mean fill (of
        batch_size), and the occupancy histogram {fill: count}."""
        with self._stats_lock:  # consistent snapshot vs _execute's updates
            requests, b = self._requests, self._batches
            fills = self._fills.copy()
        return {
            "requests": int(requests),
            "batches": int(b),
            "batch_size": int(self.predictor.batch_size),
            "mean_fill": float(requests / b) if b else 0.0,
            "fill_hist": {
                str(i): int(c)
                for i, c in enumerate(fills)
                if i > 0 and c
            },
        }

    def close(self):
        """Drain the queue, process the final partial batch, stop the
        dispatcher and executor pool. Subsequent ``submit`` calls raise."""
        with self._cv:
            self._stopped = True
            self._cv.notify_all()
        self._worker.join()
        self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
