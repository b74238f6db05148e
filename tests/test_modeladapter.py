"""M7 batched-inference template: fixed-size stacking, remainder
batches, pluggable weights."""

import numpy as np
import pandas as pd

from latyas_spark.pipeline import modeladapter as ma


def test_resize_fixed_shapes():
    for h, w in [(16, 16), (17, 931), (448, 448), (1000, 3)]:
        out = ma._resize_fixed(np.zeros((h, w), np.uint8))
        assert out.shape == (448, 448)
    # constant raster stays constant; corner values survive
    r = np.full((20, 30), 9, np.uint8)
    assert (ma._resize_fixed(r) == 9).all()


def test_fake_model_contract():
    batch = np.zeros((3, 448, 448), np.uint8)
    labels, confs = ma.fake_model(batch)
    assert len(labels) == 3 and len(confs) == 3
    assert labels[0] in ma._LABELS and confs[0] == 0.0


def _media_df(spark, n):
    rows = [
        (f"m{i:03d}", 16 + i % 50, 16 + (i * 7) % 40, f"payload-{i}".encode())
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "media_ref string, width int, height int, payload binary"
    )


def test_infer_media_batches_and_remainder(spark):
    out = (
        ma.infer_media(
            _media_df(spark, 10).coalesce(1), batch_size=4, spread=False
        )
        .toPandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    assert len(out) == 10
    # one partition, batch_size 4 -> batches of 4, 4, 2 (remainder)
    assert sorted(out["batch_size"].tolist()) == [2, 2, 4, 4, 4, 4, 4, 4, 4, 4]
    assert set(out["label"]) <= set(ma._LABELS)
    # deterministic end-to-end
    out2 = (
        ma.infer_media(
            _media_df(spark, 10).coalesce(1), batch_size=4, spread=False
        )
        .toPandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_register_model_swap(spark):
    def my_model(batch):
        assert batch.shape[1:] == (448, 448)
        return ["swapped"] * len(batch), [1.0] * len(batch)

    old = ma._MODEL
    try:
        ma.register_model(my_model)
        out = ma.infer_media(_media_df(spark, 3), batch_size=8).toPandas()
        assert (out["label"] == "swapped").all() and (out["conf"] == 1.0).all()
    finally:
        ma.register_model(old)


def test_artifact_weights_through_adapter(spark, tmp_path):
    """docs/INTEGRATION.md recipe with REAL serialized weights — the
    closest live-model smoke this sandbox permits (onnxruntime/torch
    are not installed, re-checked; test_integration_recipe.py stays
    env-gated for the true ONNX path): a linear classifier's weight
    matrix is written to an .npz ARTIFACT FILE, the registered model
    fn lazily loads it per worker (rule 2: load once, not per batch),
    and a live Spark job runs it through register_model -> infer_media.
    The outputs must equal a local numpy recomputation over the same
    decode -> resize -> stack chain, proving the adapter's contract
    holds weights that come from an external artifact, not from code."""
    from latyas_spark.relational import multimodal

    rng = np.random.default_rng(7)
    w = rng.standard_normal((len(ma._LABELS), 448))
    b = rng.standard_normal(len(ma._LABELS))
    path = str(tmp_path / "weights.npz")
    np.savez(path, w=w, b=b)

    cache = {}

    def npz_model(batch):
        if "w" not in cache:  # lazy, once per worker/task lifetime
            z = np.load(path)
            cache["w"], cache["b"] = z["w"], z["b"]
        feats = batch.astype(np.float64).mean(axis=1)  # (B, 448)
        logits = feats @ cache["w"].T + cache["b"]
        idx = logits.argmax(axis=1)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        conf = e.max(axis=1) / e.sum(axis=1)
        return (
            [ma._LABELS[i] for i in idx],
            [round(float(c), 6) for c in conf],
        )

    old = ma._MODEL
    try:
        ma.register_model(npz_model)
        got = (
            ma.infer_media(_media_df(spark, 23), batch_size=8)
            .toPandas()
            .sort_values("media_ref")
            .reset_index(drop=True)
        )
    finally:
        ma.register_model(old)
    assert len(got) == 23
    # local recomputation: same decode, same resize, same weights
    rows = [
        (f"m{i:03d}", 16 + i % 50, 16 + (i * 7) % 40, f"payload-{i}".encode())
        for i in range(23)
    ]
    rasters = np.stack(
        [
            ma._resize_fixed(multimodal._DECODER(p, wd, ht))
            for (_, wd, ht, p) in rows
        ]
    )
    want_labels, want_confs = npz_model(rasters)
    assert got["label"].tolist() == want_labels
    assert got["conf"].tolist() == want_confs
    # the model genuinely discriminates (not a constant head)
    assert len(set(want_labels)) > 1
