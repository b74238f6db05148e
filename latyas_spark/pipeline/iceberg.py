"""Iceberg-backed checkpoint/resume (optional runtime).

``checkpoint.py`` implements the design's documented parquet fallback;
this module is the design target when ``iceberg-spark-runtime`` is on
the classpath (SURVEY.md §1.4, §4.3):

* spans land in an Iceberg table partitioned by the HIDDEN transform
  ``bucket(N, doc_id)`` — readers filtering on doc_id prune to one
  bucket file set with no derived column in the schema;
* each checkpoint bucket commits with ONE overwrite-by-filter
  (``writeTo(...).overwrite(col("ckpt_bucket") == b)``) — atomic and
  idempotent per bucket, the Iceberg analog of the parquet writer's
  overwrite-per-bucket-directory + manifest rename;
* the manifest is an Iceberg ``checkpoint`` table (one row per
  completed bucket, lineage as a nested array) instead of JSON files;
  resume reads done buckets with a snapshot-consistent scan.

No Iceberg Python bindings exist to import — the integration is pure
Spark SQL / DataFrame API against the catalog the jar provides, so
this module imports cleanly WITHOUT the jar and fails only when used.
Callers gate on ``iceberg_jar_present()``; the test suite
(tests/test_iceberg_optional.py) skips, not fails, in jar-less
sandboxes.  The control flow deliberately mirrors
``checkpoint.run_checkpointed`` (same drift guard, same fail_after
hook, same summary dict) so the two backends stay drop-in swappable.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.document import DEFAULT_CONFIG, ExtractConfig
from .checkpoint import config_fingerprint, with_bucket
from .extract import MEGA_THRESHOLD, extract_spans_flat
from .session import build_session


def iceberg_jar_present() -> bool:
    """True iff an iceberg-spark-runtime jar is visible — checked on
    the filesystem (no JVM spin-up) in the standard jar locations plus
    ``$SPARK_ICEBERG_JAR``."""
    if os.environ.get("SPARK_ICEBERG_JAR"):
        return os.path.exists(os.environ["SPARK_ICEBERG_JAR"])
    candidates = []
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        candidates.append(os.path.join(spark_home, "jars"))
    try:
        import pyspark

        candidates.append(
            os.path.join(os.path.dirname(pyspark.__file__), "jars")
        )
    except ImportError:  # pragma: no cover
        pass
    return any(
        glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        for d in candidates
    )


def iceberg_session(
    warehouse: str,
    master: Optional[str] = None,
    catalog: str = "local",
    app_name: str = "latyas_iceberg",
) -> SparkSession:
    """build_session + the Iceberg extension and a local hadoop catalog
    rooted at ``warehouse``.  Requires the runtime jar; on a cluster
    the same conf points at the production catalog instead."""
    extra = {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }
    if os.environ.get("SPARK_ICEBERG_JAR"):
        extra["spark.jars"] = os.environ["SPARK_ICEBERG_JAR"]
    return build_session(master=master, app_name=app_name, extra_conf=extra)


def ensure_tables(
    spark: SparkSession,
    ns: str,
    n_buckets: int,
    doc_id_buckets: int = 64,
) -> None:
    """Create the span + checkpoint tables if absent.

    The spans table is partitioned by BOTH the hidden
    ``bucket(doc_id)`` transform (read-side pruning on doc_id) and the
    explicit ``ckpt_bucket`` column (the checkpoint commit unit the
    overwrite filter targets)."""
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {ns}")
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {ns}.spans (
          doc_id STRING, `order` INT, kind STRING, text STRING,
          media_ref STRING, _pid INT, ckpt_bucket INT
        ) USING iceberg
        PARTITIONED BY (ckpt_bucket, bucket({doc_id_buckets}, doc_id))
        """
    )
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {ns}.checkpoint (
          run_id STRING, bucket INT, status STRING, config_sha STRING,
          spans BIGINT, wall_sec DOUBLE,
          lineage ARRAY<STRUCT<partition_id: INT, spans: BIGINT>>
        ) USING iceberg
        """
    )


def completed_buckets_iceberg(spark: SparkSession, ns: str) -> list:
    if not spark.catalog.tableExists(f"{ns}.checkpoint"):
        return []
    rows = (
        spark.table(f"{ns}.checkpoint")
        .filter(F.col("status") == "done")
        .select("bucket", "config_sha")
        .collect()
    )
    return sorted((r["bucket"], r["config_sha"]) for r in rows)


def run_checkpointed_iceberg(
    spark: SparkSession,
    joined: DataFrame,
    ns: str,
    n_buckets: int = 16,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    mega_threshold: int = MEGA_THRESHOLD,
    fail_after: Optional[int] = None,
    run_id: str = "run-0",
) -> dict:
    """checkpoint.run_checkpointed with Iceberg commits.

    Identical contract: extract bucket-by-bucket, skip buckets already
    recorded done, refuse config drift, return {buckets_done,
    buckets_skipped, spans_written}.  Differences are the commit
    mechanics only: span data commits via overwrite-by-filter on
    ``ckpt_bucket`` (atomic + idempotent — re-running a bucket replaces
    exactly its own rows), the manifest via an append to the
    ``checkpoint`` table AFTER the data commit (a crash between the two
    re-runs that bucket; the overwrite makes that safe)."""
    fp = config_fingerprint(cfg, mega_threshold)
    ensure_tables(spark, ns, n_buckets)
    done_rows = completed_buckets_iceberg(spark, ns)
    for b, prev in done_rows:
        if prev is not None and prev != fp:
            raise ValueError(
                f"resume config drift: bucket {b} was extracted under "
                f"config_sha {prev[:12]}..., this run is {fp[:12]}...; "
                "finish with the original config or write to a new table"
            )
    done = {b for b, _ in done_rows}
    bucketed = with_bucket(joined, n_buckets)

    spans_written = 0
    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"injected failure after {processed} buckets")
        t0 = time.perf_counter()
        part = bucketed.filter(F.col("bucket") == b).drop("bucket")
        spans = extract_spans_flat(part, cfg, mega_threshold=mega_threshold)
        spans = spans.withColumn("_pid", F.spark_partition_id()).withColumn(
            "ckpt_bucket", F.lit(b).cast("int")
        )
        # the overwrite-by-filter commit: replaces exactly this
        # bucket's rows in one atomic Iceberg snapshot
        spans.writeTo(f"{ns}.spans").overwrite(F.col("ckpt_bucket") == b)

        written = spark.table(f"{ns}.spans").filter(
            F.col("ckpt_bucket") == b
        )
        lineage = written.groupBy("_pid").agg(F.count("*").alias("cnt"))
        lrows = [
            (int(r["_pid"]), int(r["cnt"])) for r in lineage.collect()
        ]
        n_spans = sum(c for _, c in lrows)
        manifest = spark.createDataFrame(
            [
                (
                    run_id,
                    b,
                    "done",
                    fp,
                    n_spans,
                    round(time.perf_counter() - t0, 3),
                    [{"partition_id": p, "spans": c} for p, c in lrows],
                )
            ],
            schema=(
                "run_id string, bucket int, status string, "
                "config_sha string, spans bigint, wall_sec double, "
                "lineage array<struct<partition_id: int, spans: bigint>>"
            ),
        )
        manifest.writeTo(f"{ns}.checkpoint").append()
        spans_written += n_spans
        processed += 1

    return {
        "buckets_done": processed,
        "buckets_skipped": len(done),
        "spans_written": spans_written,
    }


def read_checkpointed_iceberg(spark: SparkSession, ns: str) -> DataFrame:
    return spark.table(f"{ns}.spans").drop("_pid", "ckpt_bucket")
