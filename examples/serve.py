"""Minimal HTTP classification server over the serving stack (stdlib only).

POST raw JPEG/PNG bytes to /classify and get top-k JSON back. The pieces:
the native decoder (data/native/decode.cpp) turns the upload into a square
uint8 batch on the host, Predictor (serving.py) runs the padded fixed-shape
bf16 forward with on-device preprocessing and top-k, so only (B, k) scalars
cross the device link.

    python examples/serve.py --model convmlp_s --pretrained --port 8000 &
    curl -s --data-binary @cat.jpg localhost:8000/classify | jq .

For production-style deployment without model code on the server, pair
``jm.deploy.save_exported`` blobs with this same loop (see docs/USAGE.md).
"""

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="MLPMixerForImageClassification")
    ap.add_argument("--pretrained", action="store_true")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--int8", action="store_true",
                    help="serve through the dynamic W8A8 int8 dense path "
                         "(2x MXU rate on TPU; see tests/test_int8.py)")
    ap.add_argument("--max-delay-ms", type=float, default=2.0,
                    help="micro-batching deadline: concurrent requests "
                         "coalesce into one fixed-shape forward, waiting "
                         "at most this long for the batch to fill "
                         "(active when --batch > 1)")
    ap.add_argument("--in-flight", type=int, default=4,
                    help="padded batches kept in flight concurrently "
                         "(overlaps the per-call host<->device round trip)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import jittor_mlp_tpu as jm
    from jittor_mlp_tpu import config
    from jittor_mlp_tpu.data.loader import decode_available, decode_batch

    config.enable_compile_cache()

    if args.pretrained:
        kwargs = {"pretrained": True}  # published weights fix the resolution
    else:
        from jittor_mlp_tpu.utils import sized_kwargs

        kwargs = sized_kwargs(getattr(jm, args.model),
                              image_size=args.image_size)
    model = getattr(jm, args.model)(**kwargs)
    pred = jm.Predictor(
        model, batch_size=args.batch, image_size=args.image_size,
        top_k=args.top_k, compute="int8" if args.int8 else None,
    ).warmup()
    # with a multi-slot batch, concurrent requests coalesce through the
    # deadline micro-batcher (serving.MicroBatcher) instead of each paying
    # a padded batch-1 forward — LATENCY.md tabulates the gap this closes
    batcher = (jm.MicroBatcher(pred, max_delay_ms=args.max_delay_ms,
                               in_flight=args.in_flight)
               if args.batch > 1 else None)
    print(f"{args.model} ready on :{args.port} "
          f"(native decode: {decode_available()}, "
          f"micro-batching: {'on' if batcher else 'off'})")

    def decode(body):
        if decode_available():
            imgs, fail = decode_batch([body], args.image_size)
            if not fail[0]:
                return imgs
        # PIL fallback with the SAME geometry as the native path (shorter-
        # side resize + center crop — ImageFolderDataset.get): both decode
        # paths must feed identical pixels for identical uploads
        from PIL import Image

        s = args.image_size
        with Image.open(io.BytesIO(body)) as im:
            im = im.convert("RGB")
            w, h = im.size
            scale = s / min(w, h)
            im = im.resize(
                (max(s, round(w * scale)), max(s, round(h * scale)))
            )
            arr = np.asarray(im, np.uint8)
        top = (arr.shape[0] - s) // 2
        left = (arr.shape[1] - s) // 2
        return arr[None, top:top + s, left:left + s]

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != "/stats":
                self.send_error(404)
                return
            stats = dict(pred.latency_stats())
            if batcher is not None:
                stats["batcher"] = batcher.stats()
            blob = json.dumps(stats).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_POST(self):
            if self.path != "/classify":
                self.send_error(404)
                return
            try:
                body = self.rfile.read(int(self.headers["Content-Length"]))
                if batcher is not None:
                    labels, probs = batcher.submit(decode(body)[0])
                else:
                    labels, probs = pred.predict(decode(body))
                    labels, probs = labels[0], probs[0]
                out = {
                    "top_k": [
                        {"label": int(l), "prob": float(p)}
                        for l, p in zip(labels, probs)
                    ]
                }
                blob = json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)
            except Exception as e:
                # status line must stay single-line: exception text can be
                # multi-line (XLA) and derives from request bytes — no
                # response splitting
                msg = str(e).splitlines()[0][:120] if str(e) else "bad request"
                self.send_error(400, "bad request", msg)

        def log_message(self, *a):
            pass

    # threaded server: handler threads block in batcher.submit while the
    # dispatcher packs them into one device batch (unbatched predict is
    # internally locked by JAX's dispatch, so threading is safe either way)
    ThreadingHTTPServer(("127.0.0.1", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
