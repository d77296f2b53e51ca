"""Serving Predictor + metrics logger (framework surfaces the reference lacks)."""

import numpy as np

import jittor_mlp_tpu as jm
from jittor_mlp_tpu.utils.metrics import MetricsLogger, read_metrics


def _tiny_model():
    return jm.MLPMixerForImageClassification(
        d_model=16, depth=1, patch_size=8, image_size=32, num_classes=10,
        use_pallas=False,
    )


def test_predictor_uint8_end_to_end():
    p = jm.Predictor(_tiny_model(), batch_size=4, image_size=32, top_k=3,
                     bf16=False).warmup()
    imgs = np.random.default_rng(0).integers(
        0, 256, (3, 32, 32, 3), dtype=np.uint8
    )
    labels, probs = p.predict(imgs)
    assert labels.shape == (3, 3) and probs.shape == (3, 3)
    assert (probs[:, 0] >= probs[:, 1]).all() and (probs >= 0).all()
    assert (probs.sum(-1) <= 1.0 + 1e-5).all()

    # padding must not change results: full batch vs padded partial agree
    labels4, _ = p.predict(np.concatenate([imgs, imgs[:1]]))
    assert (labels4[:3] == labels).all()


def test_predictor_resizes_and_rejects_oversize():
    p = jm.Predictor(_tiny_model(), batch_size=2, image_size=32, bf16=False)
    imgs = np.zeros((2, 48, 48, 3), np.uint8)  # on-device resize 48->32
    labels, _ = p.predict(imgs)
    assert labels.shape == (2, 5)
    try:
        p.predict(np.zeros((3, 48, 48, 3), np.uint8))
        assert False, "oversize request must raise"
    except ValueError:
        pass


def test_predictor_latency_stats():
    """Per-request latency observability: empty before traffic, sane
    percentiles after; the window covers upload+forward+download."""
    p = jm.Predictor(_tiny_model(), batch_size=2, image_size=32, bf16=False)
    assert p.latency_stats() == {}
    imgs = np.zeros((2, 32, 32, 3), np.uint8)
    for _ in range(5):
        p.predict(imgs)
    s = p.latency_stats()
    assert s["count"] == 5
    assert 0 < s["p50_ms"] <= s["p95_ms"] <= s["p99_ms"] <= s["max_ms"]
    assert s["mean_ms"] > 0


def test_metrics_logger_roundtrip(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path, flush_every=2, extra={"model": "t"})
    log.log(0, loss=1.5, lr=1e-3)
    log.log(1, loss=1.25, lr=1e-3)  # triggers flush
    log.log(2, loss=1.0, lr=1e-3)
    log.flush()
    cols = read_metrics(path)
    assert cols["step"] == [0, 1, 2]
    assert cols["loss"] == [1.5, 1.25, 1.0]
    assert all(t >= 0 for t in cols["time"])


def test_predictor_auto_dtype_from_tuned_table():
    """bf16=None resolves the serving dtype from tuned.SERVE (VERDICT r4 #3):
    s2_mlp_v2 serves f32 (its bf16 argmax agreement is 72% — the measured
    numerics guardrail), dyna_mlp serves bf16 and NEVER auto-int8 (int8 is
    0.36x its bf16 throughput), mlp_mixer serves dynamic int8 (the one model
    where int8 measurably wins at full agreement). Resolution is by
    model.name, so tiny configs pin the exact production defaults."""
    assert jm.Predictor(_tiny_model(), batch_size=2, image_size=32).dtype \
        == "int8"  # mlp_mixer

    m = _tiny_model()
    m.name = "s2_mlp_v2"
    assert jm.Predictor(m, batch_size=2, image_size=32).dtype == "f32"

    m = _tiny_model()
    m.name = "dyna_mlp"
    assert jm.Predictor(m, batch_size=2, image_size=32).dtype == "bf16"

    # unswept custom models keep the bf16 default
    m = _tiny_model()
    m.name = "my_custom_model"
    assert jm.Predictor(m, batch_size=2, image_size=32).dtype == "bf16"

    # explicit args override the table
    m = _tiny_model()
    m.name = "s2_mlp_v2"
    assert jm.Predictor(m, batch_size=2, image_size=32,
                        bf16=True).dtype == "bf16"
    assert jm.Predictor(_tiny_model(), batch_size=2, image_size=32,
                        bf16=False).dtype == "f32"


def test_predictor_int8_compute():
    """compute="int8" serves through the dynamic W8A8 path: probabilities
    stay close to the f32 predictor's and the flag doesn't leak out."""
    from jittor_mlp_tpu import config

    m = _tiny_model()
    imgs = np.random.default_rng(1).integers(
        0, 256, (4, 32, 32, 3), dtype=np.uint8
    )
    _, probs_f32 = jm.Predictor(m, batch_size=4, image_size=32, top_k=10,
                                bf16=False).warmup().predict(imgs)
    _, probs_q = jm.Predictor(m, batch_size=4, image_size=32, top_k=10,
                              bf16=False, compute="int8").warmup().predict(imgs)
    assert not config.int8_matmul
    assert np.all(np.isfinite(probs_q))
    assert np.abs(probs_q - probs_f32).max() < 5e-2
