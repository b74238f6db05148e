"""Bucketed warehouse layout: the whole point is the PLAN — a join of
two same-bucketed tables must run with zero Exchange (no shuffle on
either side), and bucket+sort must also drop the per-task Sort."""

import contextlib

import pytest
from pyspark.sql import functions as F

from latyas_spark.pipeline.warehouse import colocated_join, write_bucketed


@contextlib.contextmanager
def _conf(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            spark.conf.set(key, v)


# force the warehouse-scale path: neither side broadcastable, and SMJ
# (the engine default prefers shuffled-hash for the kernel-feeding
# join; for generic bucketed joins SMJ streams instead of building a
# hash map)
_SMJ = {
    "spark__sql__autoBroadcastJoinThreshold": "-1",
    "spark__sql__join__preferSortMergeJoin": "true",
    # read-side use of the write-time sortBy was put behind this conf
    # in Spark 3.0 (SPARK-28632: the one-file-per-bucket check got
    # expensive on huge tables); write_bucketed guarantees one file
    # per bucket, so the check is safe to enable here
    "spark__sql__legacy__bucketedTableScan__outputOrdering": "true",
}


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("wh")
    docs = spark.range(2000).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id"),
        (F.col("id") % 7).alias("feature"),
    )
    blocks = spark.range(6000).select(
        F.concat(F.lit("doc-"), (F.col("id") % 2000).cast("string")).alias(
            "doc_id"
        ),
        F.col("id").alias("block_id"),
    )
    write_bucketed(
        docs, "wh_docs", n_buckets=8, sort_cols=["doc_id"],
        path=str(base / "docs"),
    )
    write_bucketed(
        blocks, "wh_blocks", n_buckets=8, sort_cols=["doc_id"],
        path=str(base / "blocks"),
    )
    yield "wh_docs", "wh_blocks"
    spark.sql("DROP TABLE IF EXISTS wh_docs")
    spark.sql("DROP TABLE IF EXISTS wh_blocks")


def test_colocated_join_has_no_exchange_or_sort(spark, bucketed_tables):
    left, right = bucketed_tables
    with _conf(spark, **_SMJ):
        joined = colocated_join(spark, left, right)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # one file per bucket (write_bucketed repartitions) => the
        # write-time sortBy satisfies SMJ ordering: no per-task Sort
        assert "Sort " not in plan.replace("SortMergeJoin", "SMJ")
        assert joined.count() == 6000


def test_one_file_per_bucket(spark, bucketed_tables, tmp_path_factory):
    """write_bucketed must emit exactly n_buckets files — multi-file
    buckets break read-side sorted scans and explode file counts
    (tasks x buckets) at warehouse scale."""
    import glob
    import os

    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED wh_docs")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    files = glob.glob(os.path.join(loc.replace("file:", ""), "*.parquet"))
    assert len(files) == 8


def test_extract_from_warehouse_matches_direct_and_has_zero_exchange(
    spark, corpus_dir, tmp_path_factory
):
    """The warehouse-fed flagship must (a) produce byte-identical spans
    to the direct parquet-fed extract_spans and (b) plan the normal-doc
    path with ZERO Exchange anywhere — scan, join, count and kernel all
    ride the write-time bucketing (SURVEY §4.3 target plan)."""
    from latyas_spark.pipeline.extract import extract_spans
    from latyas_spark.pipeline.warehouse import (
        extract_from_warehouse,
        ingest_corpus,
    )

    base = str(tmp_path_factory.mktemp("whx"))
    spans_t, blocks_t = ingest_corpus(
        spark, corpus_dir, n_buckets=8, prefix="whx", base_path=base
    )
    try:
        docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
        blocks = spark.read.parquet(f"{corpus_dir}/layout_blocks.parquet")
        direct = sorted(
            (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
            for r in extract_spans(docs, blocks).collect()
        )
        wh = sorted(
            (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
            for r in extract_from_warehouse(spark, spans_t, blocks_t).collect()
        )
        assert wh == direct

        # plan audit on the pure doc path (mega routing off): the whole
        # job — bucketed scans, join, kernel — must contain no Exchange.
        # Broadcast is disabled for the audit: at test scale AQE would
        # broadcast the blocks side (also exchange-free on the stream
        # side, but not the warehouse-scale shape we're pinning).
        with _conf(spark, spark__sql__autoBroadcastJoinThreshold="-1"):
            plan = (
                extract_from_warehouse(
                    spark, spans_t, blocks_t, mega_threshold=-1
                )
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        assert "Exchange" not in plan
        assert "mapInPandas" in plan or "MapInPandas" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS whx_spans")
        spark.sql("DROP TABLE IF EXISTS whx_blocks")


def test_join_values_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    got = (
        colocated_join(spark, left, right)
        .groupBy("feature")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # 2000 docs x 3 blocks each, features 0..6 over id % 7
    assert sum(r["n"] for r in got) == 6000
    assert {r["feature"] for r in got} == set(range(7))
