"""Iceberg-backed checkpoint/resume suite (VERDICT r2 #7).

Runs ONLY when iceberg-spark-runtime is on the classpath (none ships
in this sandbox, so every test here SKIPS — not fails — locally; on a
cluster image with the jar, the same suite exercises real
overwrite-by-filter commits and hidden bucket(doc_id) partitioning).
The module under test (latyas_spark/pipeline/iceberg.py) imports and
is lint/AST-covered regardless; this gate covers only the live-JVM
half.
"""

import pytest

from latyas_spark.pipeline.iceberg import iceberg_jar_present

pytestmark = pytest.mark.skipif(
    not iceberg_jar_present(),
    reason="iceberg-spark-runtime jar not on classpath (expected in "
    "this sandbox; see README 'Iceberg runtime')",
)


@pytest.fixture(scope="module")
def ice_spark(tmp_path_factory):
    from latyas_spark.pipeline.iceberg import iceberg_session

    wh = str(tmp_path_factory.mktemp("ice_wh"))
    spark = iceberg_session(wh, master="local[4]")
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def ice_joined(ice_spark, tmp_path_factory):
    from latyas_spark.fixtures import write_corpus
    from latyas_spark.pipeline.extract import KERNEL_COLS, explode_documents

    d = str(tmp_path_factory.mktemp("ice_corpus"))
    write_corpus(d, n_docs=60)
    docs = ice_spark.read.parquet(f"{d}/documents.parquet")
    blocks = ice_spark.read.parquet(f"{d}/layout_blocks.parquet")
    return (
        explode_documents(docs)
        .join(blocks, ["doc_id", "offset"])
        .select(*KERNEL_COLS)
    )


def _collect(df):
    return sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in df.collect()
    )


def test_interrupt_resume_equals_single_shot(ice_spark, ice_joined):
    from latyas_spark.pipeline.iceberg import (
        read_checkpointed_iceberg,
        run_checkpointed_iceberg,
    )

    s = run_checkpointed_iceberg(
        ice_spark, ice_joined, "local.ck_single", n_buckets=8
    )
    assert s["buckets_done"] == 8

    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed_iceberg(
            ice_spark, ice_joined, "local.ck_resume", n_buckets=8,
            fail_after=3,
        )
    s2 = run_checkpointed_iceberg(
        ice_spark, ice_joined, "local.ck_resume", n_buckets=8
    )
    assert s2["buckets_skipped"] == 3 and s2["buckets_done"] == 5
    assert _collect(
        read_checkpointed_iceberg(ice_spark, "local.ck_single")
    ) == _collect(read_checkpointed_iceberg(ice_spark, "local.ck_resume"))


def test_overwrite_by_filter_is_idempotent(ice_spark, ice_joined):
    """Re-running one bucket replaces exactly its own rows: the second
    commit must not duplicate spans (the atomicity property the parquet
    fallback gets from directory overwrite + manifest rename)."""
    from latyas_spark.pipeline.checkpoint import with_bucket
    from latyas_spark.pipeline.extract import extract_spans_flat
    from latyas_spark.pipeline.iceberg import (
        ensure_tables,
        run_checkpointed_iceberg,
    )
    import pyspark.sql.functions as F

    ns = "local.ck_idem"
    run_checkpointed_iceberg(ice_spark, ice_joined, ns, n_buckets=4)
    before = ice_spark.table(f"{ns}.spans").count()
    # replay bucket 2's data commit manually
    part = (
        with_bucket(ice_joined, 4).filter(F.col("bucket") == 2).drop("bucket")
    )
    spans = (
        extract_spans_flat(part)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("ckpt_bucket", F.lit(2).cast("int"))
    )
    spans.writeTo(f"{ns}.spans").overwrite(F.col("ckpt_bucket") == 2)
    assert ice_spark.table(f"{ns}.spans").count() == before


def test_resume_refuses_config_drift(ice_spark, ice_joined):
    from latyas_spark.core.document import ExtractConfig
    from latyas_spark.pipeline.iceberg import run_checkpointed_iceberg

    ns = "local.ck_drift"
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed_iceberg(
            ice_spark, ice_joined, ns, n_buckets=4, fail_after=2
        )
    with pytest.raises(ValueError, match="resume config drift"):
        run_checkpointed_iceberg(
            ice_spark, ice_joined, ns, n_buckets=4,
            cfg=ExtractConfig(conf_threshold=0.5),
        )


def test_hidden_partition_prunes_doc_id_filter(ice_spark, ice_joined):
    """bucket(N, doc_id) is a hidden transform: an equality filter on
    doc_id must prune the scan to one bucket's files without any
    derived column in the query."""
    from latyas_spark.pipeline.iceberg import run_checkpointed_iceberg

    ns = "local.ck_prune"
    run_checkpointed_iceberg(ice_spark, ice_joined, ns, n_buckets=2)
    some_doc = ice_spark.table(f"{ns}.spans").select("doc_id").first()[0]
    plan = (
        ice_spark.table(f"{ns}.spans")
        .filter(f"doc_id = '{some_doc}'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Iceberg's scan reports the pushed filter; the bucket transform
    # prunes at planning time (file count assertion would be flaky
    # across iceberg versions, the pushed-filter line is stable)
    assert "doc_id" in plan
