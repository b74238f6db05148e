"""Gated end-to-end test of docs/INTEGRATION.md's real-model recipe.

Runs ONLY when onnxruntime is importable AND $LATYAS_TEST_ONNX points
at a classifier ONNX file with a (B, 1, 448, 448) float32 input —
neither ships in this sandbox, so the module SKIPS here.  On an
environment with both, it drives a real ONNX session through
register_model -> infer_media on a live Spark job, proving the recipe
(lazy per-worker session, stacked batches, batch_size audit column)
verbatim.
"""

import os

import pytest

def _gate():
    try:
        import onnxruntime  # noqa: F401
    except ImportError:
        return "onnxruntime not installed"
    p = os.environ.get("LATYAS_TEST_ONNX")
    if not p or not os.path.exists(p):
        return "LATYAS_TEST_ONNX not set / missing"
    return None


_REASON = _gate()
pytestmark = pytest.mark.skipif(
    _REASON is not None,
    reason=f"{_REASON} (expected in this sandbox; docs/INTEGRATION.md)",
)

_SESS = None


def _session():
    # INTEGRATION.md rule 2: lazy, once per python worker
    global _SESS
    if _SESS is None:
        import onnxruntime as ort

        _SESS = ort.InferenceSession(
            os.environ["LATYAS_TEST_ONNX"],
            providers=["CPUExecutionProvider"],
        )
    return _SESS


def onnx_model(batch):
    import numpy as np

    sess = _session()
    x = batch.astype(np.float32)[:, None, :, :] / 255.0
    (logits,) = sess.run(None, {sess.get_inputs()[0].name: x})
    idx = logits.argmax(axis=1)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    conf = (e.max(axis=1) / e.sum(axis=1)).tolist()
    return [f"class_{i}" for i in idx], [float(c) for c in conf]


def test_onnx_recipe_end_to_end(spark):
    from latyas_spark.pipeline import modeladapter

    n = 100
    media = spark.createDataFrame(
        [
            (f"m{i:03d}", 16 + i % 50, 16 + (i * 7) % 40,
             f"payload-{i}".encode())
            for i in range(n)
        ],
        "media_ref string, width int, height int, payload binary",
    )
    prev = modeladapter._MODEL
    modeladapter.register_model(onnx_model)
    try:
        out = modeladapter.infer_media(
            media.coalesce(2), batch_size=8, spread=False
        ).toPandas()
        assert len(out) == n
        # stacked batches really happened: full batches dominate
        assert (out["batch_size"] == 8).mean() > 0.5
        assert out["label"].str.startswith("class_").all()
        assert out["conf"].between(0.0, 1.0).all()
    finally:
        modeladapter.register_model(prev)
