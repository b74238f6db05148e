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
