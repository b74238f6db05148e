"""Bucketed checkpoint/resume writer with per-partition lineage.

North-rule requirement: interrupted runs resume at partition
granularity, with per-partition lineage + metrics rows
(SURVEY.md §4.3).  Design:

* docs are assigned to ``n_buckets`` buckets by ``pmod(xxhash64(
  doc_id), n_buckets)`` — the same salted hash the shuffle uses, so a
  bucket is a stable horizontal slice of the corpus;
* each bucket is extracted and written as an independent job to
  ``<out>/spans/bucket=<b>/``; on success a manifest JSON is renamed
  atomically into ``<out>/_checkpoint/`` recording row counts, wall
  time and per-Spark-partition lineage (partition id -> span count);
* a resumed run lists ``_checkpoint`` and skips completed buckets (the
  anti-join of all buckets against done buckets); output idempotence
  comes from overwrite-per-bucket-directory.

This is the documented parquet fallback of the Iceberg design in
SURVEY.md §4.3 (no Iceberg runtime jars ship in this sandbox): with
Iceberg available, the manifest becomes a ``checkpoint`` table and the
per-bucket write an overwrite-by-filter commit — the control flow is
identical.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.document import DEFAULT_CONFIG, ExtractConfig
from .extract import MEGA_THRESHOLD, extract_spans_flat


def config_fingerprint(cfg: ExtractConfig, mega_threshold: int) -> str:
    """Deterministic sha256 of everything that shapes the output: the
    ExtractConfig fields (frozensets canonicalized — their repr order
    is not stable) and the mega-doc threshold.  Recorded in every
    bucket manifest so resume can refuse config drift; callers using
    hub-resolved rule tables (rulehub.py) get this for free since the
    rules land in cfg.ruled_kinds."""
    parts = []
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if isinstance(v, frozenset):
            v = sorted(v)
        parts.append(f"{f.name}={v!r}")
    parts.append(f"mega_threshold={mega_threshold}")
    return hashlib.sha256(";".join(parts).encode()).hexdigest()


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )


def _ckpt_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_checkpoint")


def completed_buckets(out_dir: str) -> List[int]:
    d = _ckpt_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("bucket_") and name.endswith(".json"):
            out.append(int(name[len("bucket_"):-len(".json")]))
    return sorted(out)


def _write_manifest(out_dir: str, bucket: int, payload: dict) -> None:
    d = _ckpt_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".bucket_{bucket}.json.tmp")
    final = os.path.join(d, f"bucket_{bucket}.json")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, final)  # atomic commit of the bucket


def run_checkpointed(
    spark: SparkSession,
    joined: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    mega_threshold: int = MEGA_THRESHOLD,
    fail_after: Optional[int] = None,
    run_id: str = "run-0",
    max_concurrent: int = 1,
) -> dict:
    """Extract bucket-by-bucket with resume.

    ``joined``: flat KERNEL_COLS frame.  ``fail_after``: test hook —
    raise after N buckets to simulate an interruption.  Returns a
    summary dict {buckets_done, buckets_skipped, spans_written}.

    ``max_concurrent``: buckets in flight at once.  Sequential bucket
    jobs leave a cluster idle between a bucket's last task and the next
    job's first wave; Spark job submission is thread-safe, so buckets
    are submitted from a small thread pool (each bucket's write +
    manifest commit stays atomic and independent — concurrency changes
    throughput, not the resume contract).  Keep 1 for deterministic
    failure-injection tests; a real cluster wants 2-4.
    """
    fp = config_fingerprint(cfg, mega_threshold)
    bucketed = with_bucket(joined, n_buckets)
    done = set(completed_buckets(out_dir))
    todo = [b for b in range(n_buckets) if b not in done]

    # Resume-compatibility guard: completed buckets were produced under
    # some config; silently extracting the REMAINING buckets under a
    # different one would mix two rule regimes in one output dataset.
    for b in sorted(done):
        with open(os.path.join(_ckpt_dir(out_dir), f"bucket_{b}.json")) as f:
            prev = json.load(f).get("config_sha")
        if prev is not None and prev != fp:
            raise ValueError(
                f"resume config drift: bucket {b} was extracted under "
                f"config_sha {prev[:12]}..., this run is {fp[:12]}...; "
                "finish with the original config or write to a new out_dir"
            )

    import threading

    lock = threading.Lock()
    state = {"spans": 0, "processed": 0, "started": 0}

    def run_bucket(b: int) -> None:
        with lock:
            if fail_after is not None and state["started"] >= fail_after:
                raise RuntimeError(
                    f"injected failure after {state['started']} buckets"
                )
            state["started"] += 1
        t0 = time.perf_counter()
        part = bucketed.filter(F.col("bucket") == b).drop("bucket")
        spans = extract_spans_flat(part, cfg, mega_threshold=mega_threshold)
        spans = spans.withColumn("_pid", F.spark_partition_id())
        target = os.path.join(out_dir, "spans", f"bucket={b}")
        spans.write.mode("overwrite").parquet(target)

        # lineage: per-Spark-partition span counts from the written data
        written = spark.read.parquet(target)
        lineage_rows = [
            {"partition_id": r["_pid"], "spans": r["cnt"]}
            for r in written.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
        ]
        n_spans = sum(r["spans"] for r in lineage_rows)
        _write_manifest(
            out_dir,
            b,
            {
                "run_id": run_id,
                "bucket": b,
                "status": "done",
                "config_sha": fp,
                "spans": n_spans,
                "wall_sec": round(time.perf_counter() - t0, 3),
                "lineage": lineage_rows,
            },
        )
        with lock:
            state["spans"] += n_spans
            state["processed"] += 1

    if max_concurrent <= 1:
        for b in todo:
            run_bucket(b)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
            futures = [pool.submit(run_bucket, b) for b in todo]
            for f in futures:
                f.result()  # re-raise the first failure

    return {
        "buckets_done": state["processed"],
        "buckets_skipped": len(done),
        "spans_written": state["spans"],
    }


def read_checkpointed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the assembled span output (drops the lineage column)."""
    return spark.read.parquet(os.path.join(out_dir, "spans")).drop("_pid")
