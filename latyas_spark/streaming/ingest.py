"""Structured-Streaming ingestion over the same extraction kernel.

The reference has no streaming (SURVEY.md §2.10) and the north rule is
batch + checkpoint/resume; this module is the engine's INGESTION story
for a corpus that keeps growing: newly-landed document files flow
through the identical batch plan via ``foreachBatch`` — one code path,
two execution modes.  The streaming checkpoint (file-source commit
log) guarantees each input file is assigned to exactly one batch_id;
end-to-end exactly-once then requires the batch WRITE to be
idempotent under retry, which a blind append is not (a batch that
fails after a partial write is retried from the checkpoint and would
double its rows).  The sink therefore partitions by batch_id and uses
dynamic partition overwrite: a retry replaces exactly its own batch's
partition, leaving committed batches untouched.

Why foreachBatch rather than a fully-streaming DAG: the extraction
kernel is a per-document batch transform (no cross-document state, no
event-time semantics), so micro-batching the *file discovery* is the
correct streaming granularity; watermark/stateful operators add cost
and no semantics here.  ``streaming_span_metrics`` shows the genuinely
streaming-stateful side: windowed span-throughput metrics with a
watermark, for the ops dashboard.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.document import DEFAULT_CONFIG, ExtractConfig
from ..pipeline.extract import MEGA_THRESHOLD, extract_spans

DOC_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def write_span_batch(spans: DataFrame, batch_id: int, output_dir: str) -> None:
    """Idempotent micro-batch sink: spans land under
    ``batch_id=<id>/`` via dynamic partition overwrite, so a batch
    retried after a partial write REPLACES its own partition instead of
    appending a second copy — the write-side half of exactly-once
    (the read-side half is the streaming checkpoint's file-commit log).
    """
    (
        spans.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_dir)
    )


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    layout_blocks: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    mega_threshold: int = MEGA_THRESHOLD,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Incremental extraction of newly-landed nested-document parquet.

    Each micro-batch runs the EXACT batch plan (extract_spans: salted
    co-partitioned join + kernel + mega routing) and commits its span
    rows under ``batch_id=<id>/`` via dynamic partition overwrite —
    idempotent under micro-batch retry (a replayed batch overwrites
    only its own partition), so delivery is exactly-once end to end.
    ``available_now=True`` drains the current backlog and stops — the
    cron-style incremental ingestion mode; pass False for a
    continuously-running tail.
    """
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spans = extract_spans(
            batch_df, layout_blocks, cfg, mega_threshold=mega_threshold
        )
        write_span_batch(spans, batch_id, output_dir)

    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_first_seen(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Cross-batch exact dedup as a CUSTOM STATEFUL streaming operator
    (``applyInPandasWithState``): the first document carrying each
    content hash is emitted, every later duplicate — in the same batch
    or any future one — is dropped.  This is T1 (dedup_exact) lifted to
    the ingestion stream: dedup-at-ingest avoids re-scanning the
    accumulated corpus on every landing.

    Scale shape: state is keyed by ``md5(text)``, so it is hash-
    partitioned across executors by the shuffle that feeds the stateful
    operator — no single task ever holds the full seen-set, and on a
    real cluster the state store should be RocksDB
    (``spark.sql.streaming.stateStore.providerClass``) so the seen-set
    spills to executor-local disk instead of heap.  State per key is
    one boolean; 10^12 seen hashes ~ tens of TB of state spread over
    the fleet, which RocksDB state stores are built for.  Within a
    batch ties resolve to the minimum doc_id (deterministic); across
    batches the file-source commit log fixes batch composition, so
    replays yield identical output.  The sink reuses the idempotent
    batch_id-partitioned overwrite, keeping exactly-once end to end.
    """
    docs = spark.readStream.schema("doc_id string, text string").parquet(
        input_dir
    )
    hashed = docs.select(
        "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("content_hash")
    )

    def keep_first(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            return  # hash emitted in an earlier batch: drop duplicates
        best = None
        for pdf in pdf_iter:
            m = pdf["doc_id"].min()
            if best is None or m < best:
                best = m
        state.update((True,))
        yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [best]})

    firsts = hashed.groupBy("content_hash").applyInPandasWithState(
        keep_first,
        outputStructType="content_hash string, doc_id string",
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf="NoTimeout",
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    writer = (
        firsts.writeStream.foreachBatch(process)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_span_metrics(
    span_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked windowed throughput metrics over a span stream with
    an ``event_ts`` column: spans/kind/docs per window, late data
    bounded by the watermark (the stateful-streaming surface of
    SURVEY.md §2.10)."""
    return (
        span_stream.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window), F.col("kind"))
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.approx_count_distinct("doc_id").alias("n_docs"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "kind",
            "n_spans",
            "n_docs",
        )
    )


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 30,
    watermark: str = "0 seconds",
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Event-time sessionization as a CUSTOM STATEFUL streaming
    operator with EVENT-TIME TIMEOUT — the streaming lift of the batch
    ``sessionize`` query (lag-window gap split): events group into
    per-user sessions that close when no event follows within
    ``gap_seconds`` of the last one.  A session is emitted exactly
    once, either when a later event for the same user arrives past the
    gap (in-batch or any later batch — the open session rides in
    state), or when the WATERMARK passes last_event + gap and the
    state times out (``GroupStateTimeout.EventTimeTimeout``) — the
    mechanism that closes sessions for users who simply stopped,
    which no data-driven operator can do.

    Scale shape: state is hash-partitioned by user_id and holds ONLY
    the open session (start, last, count — three int64s), never the
    event list, so a mega-user costs O(1) state; per batch each user's
    new events are one sorted in-memory run.  Late events beyond the
    watermark are dropped by the engine before the operator (the
    standard watermark contract); replays are deterministic because
    the file-source commit log fixes batch composition.  RocksDB state
    store note as in ``stream_dedup_first_seen``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000
    reader = spark.readStream.schema(
        "user_id bigint, event_ts timestamp, event_type string"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_dir).withWatermark("event_ts", watermark)

    out_schema = (
        "user_id bigint, session_start timestamp,"
        " session_end timestamp, n_events bigint"
    )

    def update_sessions(key, pdf_iter, state):
        import pandas as pd

        def emit(rows):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows),
                    "session_start": [
                        pd.to_datetime(s, unit="us") for s, _, _ in rows
                    ],
                    "session_end": [
                        pd.to_datetime(l, unit="us") for _, l, _ in rows
                    ],
                    "n_events": [n for _, _, n in rows],
                }
            )

        if state.hasTimedOut:
            s, l, n = state.get
            state.remove()
            yield emit([(s, l, n)])
            return

        ts = []
        for pdf in pdf_iter:
            ts.extend(pdf["event_ts"].astype("int64") // 1000)
        ts.sort()
        if state.exists:
            s, l, n = state.get
        else:  # first event seeds the open session
            s, l, n = ts[0], ts[0], 1
            ts = ts[1:]
        closed = []
        for t in ts:
            if t - l > gap_us:
                closed.append((s, l, n))
                s, l, n = t, t, 1
            else:
                l = max(l, t)
                n += 1
        state.update((int(s), int(l), int(n)))
        state.setTimeoutTimestamp(int(l) // 1000 + gap_seconds * 1000)
        if closed:
            yield emit(closed)

    sessions = events.groupBy("user_id").applyInPandasWithState(
        update_sessions,
        outputStructType=out_schema,
        stateStructType="start_us bigint, last_us bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    writer = (
        sessions.writeStream.foreachBatch(process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
