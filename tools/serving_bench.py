"""A/B the deadline micro-batcher against per-request serving, on-chip.

LATENCY.md tabulates the *potential* (b64 throughput is 1.6-8.3x the b1
rate); this measures how much of it MicroBatcher actually recovers under
concurrent request-sized traffic. Both arms run the same Predictor stack
(uint8 ingestion, on-device preprocess, top-k on device):

- unbatched: a batch_size=1 Predictor, each client thread calls
  ``predict`` directly (requests serialize on the device queue) — the
  pre-batcher serve.py behavior;
- batched: a batch_size=B Predictor behind MicroBatcher(max_delay_ms),
  client threads block in ``submit`` while the dispatcher coalesces.

Per arm it prints one JSON line: offered concurrency, requests/s, and
client-side latency percentiles, appended to serving_sweep.jsonl by the
doc pipeline.

    python tools/serving_bench.py --model MLPMixerForImageClassification \
        --batch 16 --clients 32 --per-client 16 --max-delay-ms 2
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_clients(n_clients, per_client, call):
    """Fire n_clients threads, each issuing per_client blocking calls.
    Returns (wall_seconds, sorted per-request latencies)."""
    lats = [[] for _ in range(n_clients)]
    barrier = threading.Barrier(n_clients + 1)

    def worker(i):
        barrier.wait()
        for _ in range(per_client):
            t0 = time.perf_counter()
            call()
            lats[i].append(time.perf_counter() - t0)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    flat = np.sort(np.concatenate([np.asarray(l) for l in lats]))
    return wall, flat


def summarize(arm, wall, lats, extra=None):
    n = len(lats)
    rec = {
        "arm": arm,
        "requests": int(n),
        "req_per_s": round(n / wall, 1),
        "p50_ms": round(float(lats[n // 2]) * 1e3, 2),
        "p95_ms": round(float(lats[min(int(0.95 * n), n - 1)]) * 1e3, 2),
        "p99_ms": round(float(lats[min(int(0.99 * n), n - 1)]) * 1e3, 2),
    }
    if extra:
        rec.update(extra)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="MLPMixerForImageClassification")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--per-client", type=int, default=16)
    ap.add_argument("--max-delay-ms", type=float, default=2.0)
    ap.add_argument("--in-flight", type=int, default=4)
    ap.add_argument("--arms", default="unbatched,batched")
    ap.add_argument("--json", default=None, help="append records here")
    args = ap.parse_args()

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu import config
    from jittor_mlp_tpu.utils import sized_kwargs

    config.enable_compile_cache()
    factory = getattr(jm, args.model)
    kwargs = sized_kwargs(factory, image_size=args.image_size)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (args.image_size, args.image_size, 3),
                       dtype=np.uint8)
    out = []
    base = {
        "model": args.model,
        "image_size": args.image_size,
        "clients": args.clients,
        "backend": None,  # filled after jax import resolves the platform
    }

    import jax

    base["backend"] = jax.devices()[0].platform

    if "unbatched" in args.arms:
        pred1 = jm.Predictor(factory(**kwargs), batch_size=1,
                             image_size=args.image_size).warmup()
        wall, lats = run_clients(args.clients, args.per_client,
                                 lambda: pred1.predict(img[None]))
        out.append(summarize("unbatched", wall, lats, base))

    if "batched" in args.arms:
        predB = jm.Predictor(factory(**kwargs), batch_size=args.batch,
                             image_size=args.image_size).warmup()
        with jm.MicroBatcher(predB, max_delay_ms=args.max_delay_ms,
                             in_flight=args.in_flight) as mb:
            wall, lats = run_clients(args.clients, args.per_client,
                                     lambda: mb.submit(img))
            stats = mb.stats()
        out.append(summarize(
            "batched", wall, lats,
            dict(base, batch=args.batch, max_delay_ms=args.max_delay_ms,
                 in_flight=args.in_flight,
                 mean_fill=round(stats["mean_fill"], 2),
                 batches=stats["batches"]),
        ))

    for rec in out:
        print(json.dumps(rec))
    if args.json:
        with open(args.json, "a") as f:
            for rec in out:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
