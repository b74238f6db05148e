"""Structured-Streaming ingestion: exactly-once incremental extraction
over the same batch kernel, and a watermarked metrics aggregation."""

import os

from latyas_spark.fixtures import corpus_rows
from latyas_spark.oracle.ref_port import extract_document_oracle


def _write_nested(spark, rows, target):
    from pyspark.sql import functions as F

    flat = spark.createDataFrame(
        [
            (
                r["doc_id"], r["offset"], r["page"], r["x1"], r["y1"],
                r["x2"], r["y2"], r["conf"], r["label"], r["kind"],
                r["text"], r["media_ref"],
            )
            for r in rows
        ],
        "doc_id string, offset int, page int, x1 double, y1 double,"
        " x2 double, y2 double, conf double, label string, kind string,"
        " text string, media_ref string",
    )
    nested = (
        flat.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("tmp")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(tmp, s -> struct(s.kind as kind, s.text as text,"
                " s.media_ref as media_ref, cast(s.offset as int) as offset))"
            ).alias("spans"),
        )
    )
    nested.write.mode("overwrite").parquet(target)
    return flat


def test_stream_extract_incremental_exactly_once(spark, tmp_path):
    from latyas_spark.streaming import stream_extract

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    rows1 = corpus_rows(6, mega_every=0, prefix="s1")
    blocks1 = _write_nested(spark, rows1, f"{in_dir}/part1")

    q = stream_extract(
        spark,
        in_dir + "/*",
        blocks1.select(
            "doc_id", "offset", "page", "x1", "y1", "x2", "y2",
            "conf", "label",
        ),
        out_dir,
        ck_dir,
    )
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    docs1 = {r["doc_id"] for r in first.select("doc_id").distinct().collect()}
    assert docs1 <= {r["doc_id"] for r in rows1}
    assert first.count() > 0

    # second batch of NEW files: only the new docs are processed
    rows2 = corpus_rows(4, mega_every=0, prefix="s2")
    blocks_all_rows = rows1 + rows2
    _write_nested(spark, rows2, f"{in_dir}/part2")
    both = spark.createDataFrame(
        [
            (
                r["doc_id"], r["offset"], r["page"], r["x1"], r["y1"],
                r["x2"], r["y2"], r["conf"], r["label"],
            )
            for r in blocks_all_rows
        ],
        "doc_id string, offset int, page int, x1 double, y1 double,"
        " x2 double, y2 double, conf double, label string",
    )
    q2 = stream_extract(spark, in_dir + "/*", both, out_dir, ck_dir)
    q2.awaitTermination(120)

    final = spark.read.parquet(out_dir)
    # part1 docs appear exactly once (checkpoint skipped their files)
    per_doc = final.groupBy("doc_id", "order").count()
    assert per_doc.filter("count > 1").count() == 0

    # content parity with the oracle for a sample doc from batch 2
    sample = sorted({r["doc_id"] for r in rows2})[0]
    got = sorted(
        (r["order"], r["kind"], r["text"], r["media_ref"])
        for r in final.filter(f"doc_id = '{sample}'").collect()
    )
    doc_rows_ = sorted(
        (r for r in rows2 if r["doc_id"] == sample),
        key=lambda r: r["offset"],
    )
    want = [
        (o, k, t, m) for (k, t, m, o) in extract_document_oracle(doc_rows_)
    ]
    assert got == want


def test_streaming_span_metrics_plan_is_streaming(spark):
    from pyspark.sql import functions as F

    from latyas_spark.streaming import streaming_span_metrics

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 10).load()
        .select(
            F.col("timestamp").alias("event_ts"),
            F.concat(F.lit("doc-"), (F.col("value") % 5).cast("string")).alias(
                "doc_id"
            ),
            F.lit("text").alias("kind"),
        )
    )
    agg = streaming_span_metrics(stream)
    assert agg.isStreaming
    cols = set(agg.columns)
    assert {"window_start", "window_end", "kind", "n_spans", "n_docs"} <= cols


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps exactly the first document per
    content hash ACROSS micro-batches, and the keyed state survives a
    query restart via the checkpoint (second drain = new query, same
    checkpoint)."""
    from latyas_spark.streaming import stream_dedup_first_seen

    in_dir = str(tmp_path / "din")
    out_dir = str(tmp_path / "dout")
    ck_dir = str(tmp_path / "dck")
    os.makedirs(in_dir)

    spark.createDataFrame(
        [("a", "same text"), ("b", "same text"), ("c", "other text")],
        "doc_id string, text string",
    ).write.parquet(f"{in_dir}/part1")
    q = stream_dedup_first_seen(spark, in_dir + "/*", out_dir, ck_dir)
    q.awaitTermination(120)
    first = {
        (r["content_hash"], r["doc_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # within-batch dedup: min doc_id wins for the duplicated text
    assert {d for _, d in first} == {"a", "c"}

    # land a second file: one cross-batch duplicate, one new text
    spark.createDataFrame(
        [("d", "same text"), ("e", "new text")],
        "doc_id string, text string",
    ).write.parquet(f"{in_dir}/part2")
    q2 = stream_dedup_first_seen(spark, in_dir + "/*", out_dir, ck_dir)
    q2.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    docs = sorted(r["doc_id"] for r in rows)
    assert docs == ["a", "c", "e"]  # d dropped: hash seen in batch 1
    # one row per distinct content hash, ever
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes))


def test_stream_retry_same_batch_is_idempotent(spark, tmp_path):
    """A micro-batch retried after a partial write must not duplicate
    rows: the sink partitions by batch_id with dynamic partition
    overwrite, so re-running process() for the same batch_id replaces
    exactly that batch's output."""
    from latyas_spark.pipeline.extract import extract_spans
    from latyas_spark.streaming.ingest import write_span_batch

    out_dir = str(tmp_path / "retry_out")
    rows = corpus_rows(4, mega_every=0, prefix="rt")
    nested_dir = str(tmp_path / "nested")
    blocks = _write_nested(spark, rows, nested_dir)
    docs = spark.read.parquet(nested_dir)
    sidecar = blocks.select(
        "doc_id", "offset", "page", "x1", "y1", "x2", "y2", "conf", "label"
    )

    def process(batch_df, batch_id):
        write_span_batch(extract_spans(batch_df, sidecar), batch_id, out_dir)

    process(docs, 7)
    once = sorted(
        (r["doc_id"], r["order"], r["kind"]) 
        for r in spark.read.parquet(out_dir).collect()
    )
    process(docs, 7)  # the retry
    twice = sorted(
        (r["doc_id"], r["order"], r["kind"]) 
        for r in spark.read.parquet(out_dir).collect()
    )
    assert once == twice  # no duplication, batch replaced in place


def test_stream_sessionize_gap_and_timeout(spark, tmp_path):
    """Event-time sessionization with state timeout, pinned against an
    independent pandas gap-split over the same events: in-batch gap
    closes, CROSS-BATCH session merge through state (user 3's session
    spans two files), and watermark-driven timeout closes for users who
    stopped.  Sentinel users in trailing single-file batches advance
    the watermark so every real session times out."""
    import datetime as dt

    import pandas as pd

    from latyas_spark.streaming import stream_sessionize

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    def t(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    schema = "user_id long, event_ts timestamp, event_type string"
    # batch 1: users 1 and 2 complete; user 3's session starts
    f1 = [
        (1, t(0), "view"), (1, t(10), "view"), (1, t(20), "click"),
        (1, t(100), "view"), (1, t(110), "purchase"),
        (2, t(5), "view"), (2, t(200), "view"),
        (3, t(300), "view"),
    ]
    # batch 2: user 3 continues (cross-batch merge) + far sentinel
    f2 = [(3, t(310), "click"), (999, t(1_000_000), "view")]
    # batch 3: second sentinel fires the remaining timeouts
    f3 = [(999, t(2_000_000), "view")]
    for i, rows in enumerate([f1, f2, f3]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{in_dir}/f{i}"
        )

    q = stream_sessionize(
        spark, in_dir + "/*", out_dir, ck_dir,
        gap_seconds=30, max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    got = (
        spark.read.parquet(out_dir)
        .filter("user_id < 999")
        .select("user_id", "session_start", "session_end", "n_events")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )

    # independent pandas sessionization of the same (non-sentinel) events
    ev = pd.DataFrame(
        [r for r in f1 + f2 + f3 if r[0] < 999],
        columns=["user_id", "event_ts", "event_type"],
    )
    want_rows = []
    for uid, g in ev.groupby("user_id"):
        tss = sorted(g["event_ts"])
        start, last, n = tss[0], tss[0], 1
        for x in tss[1:]:
            if (x - last).total_seconds() > 30:
                want_rows.append((uid, start, last, n))
                start, last, n = x, x, 1
            else:
                last, n = x, n + 1
        want_rows.append((uid, start, last, n))
    want = (
        pd.DataFrame(
            want_rows,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64"}),
        want.astype({"n_events": "int64"}),
        check_dtype=False,
    )
    # the cross-batch merge specifically: user 3 is ONE 2-event session
    u3 = got[got.user_id == 3]
    assert len(u3) == 1 and int(u3.iloc[0]["n_events"]) == 2
