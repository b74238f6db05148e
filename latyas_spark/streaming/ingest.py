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
