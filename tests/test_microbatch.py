"""MicroBatcher: deadline-coalesced serving batches over Predictor.

The reference has no serving layer (SURVEY §1); the batcher is the piece
that lets one fixed-shape compiled forward absorb request-sized traffic
(the b1→b64 gap tabulated in LATENCY.md). Contract under test:

- results are bit-identical to unbatched predict (per-sample independence
  in eval mode: LN per sample, BN running stats);
- a partial batch dispatches at the deadline instead of waiting forever;
- concurrent submissions coalesce (mean fill > 1 under parallel load);
- shape mismatches fail in the offending caller, not the in-flight batch;
- close() drains and subsequent submits raise.
"""

import threading

import numpy as np

import jittor_mlp_tpu as jm


def _tiny_predictor(batch_size=4):
    model = jm.MLPMixerForImageClassification(
        d_model=16, depth=1, patch_size=8, image_size=32, num_classes=10,
        use_pallas=False,
    )
    return jm.Predictor(model, batch_size=batch_size, image_size=32,
                        top_k=3, bf16=False).warmup()


def test_batched_results_match_unbatched():
    pred = _tiny_predictor(batch_size=4)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    want_labels, want_probs = [], []
    for i in range(8):
        l, p = pred.predict(imgs[i:i + 1])
        want_labels.append(l[0])
        want_probs.append(p[0])

    with jm.MicroBatcher(pred, max_delay_ms=20.0) as mb:
        results = [None] * 8

        def worker(i):
            results[i] = mb.submit(imgs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = mb.stats()

    for i in range(8):
        labels, probs = results[i]
        assert labels.shape == (3,) and probs.shape == (3,)
        # exact: same compiled graph, per-sample independent rows
        assert (labels == want_labels[i]).all()
        np.testing.assert_array_equal(probs, want_probs[i])
    assert stats["requests"] == 8
    # 8 concurrent submits into a 4-slot batch: at most 8 batches, and
    # under any real interleaving fewer (coalescing happened)
    assert stats["batches"] <= 8
    assert sum(int(k) * v for k, v in stats["fill_hist"].items()) == 8


def test_partial_batch_dispatches_at_deadline():
    pred = _tiny_predictor(batch_size=4)
    img = np.zeros((32, 32, 3), np.uint8)
    with jm.MicroBatcher(pred, max_delay_ms=5.0) as mb:
        # a single request must come back without 3 more arriving
        labels, probs = mb.submit(img)
        assert labels.shape == (3,)
        assert mb.stats()["fill_hist"].get("1") == 1


def test_coalescing_under_concurrency():
    pred = _tiny_predictor(batch_size=4)
    img = np.zeros((32, 32, 3), np.uint8)
    with jm.MicroBatcher(pred, max_delay_ms=50.0) as mb:
        barrier = threading.Barrier(4)

        def worker():
            barrier.wait()
            mb.submit(img)

        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        s = mb.stats()
    assert s["requests"] == 4
    # 4 simultaneous submits with a 50 ms window on a warmed graph must
    # coalesce into fewer than 4 single-image batches
    assert s["batches"] < 4
    assert s["mean_fill"] > 1.0


def test_shape_mismatch_raises_in_caller():
    pred = _tiny_predictor(batch_size=2)
    good = np.zeros((32, 32, 3), np.uint8)
    bad = np.zeros((48, 48, 3), np.uint8)
    with jm.MicroBatcher(pred, max_delay_ms=5.0) as mb:
        mb.submit(good)
        try:
            mb.submit(bad)
            assert False, "mismatched shape must raise"
        except ValueError:
            pass
        # the batcher stays serviceable afterwards
        labels, _ = mb.submit(good)
        assert labels.shape == (3,)


def test_close_drains_and_rejects_new_work():
    pred = _tiny_predictor(batch_size=4)
    img = np.zeros((32, 32, 3), np.uint8)
    mb = jm.MicroBatcher(pred, max_delay_ms=1000.0)
    results = []

    def worker():
        results.append(mb.submit(img))

    t = threading.Thread(target=worker)
    t.start()
    # close() while the request is still waiting out its 1 s deadline:
    # the dispatcher must process it as the final partial batch
    import time

    time.sleep(0.05)
    mb.close()
    t.join(timeout=10)
    assert not t.is_alive()
    assert len(results) == 1 and results[0][0].shape == (3,)
    try:
        mb.submit(img)
        assert False, "submit after close must raise"
    except RuntimeError:
        pass
