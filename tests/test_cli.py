"""End-to-end pin of the north-rule packaging path: the spark-submit
CLI with --py-files dist/latyas_spark.zip over a JSONL corpus — the
exact invocation a cluster user runs.  Skips when spark-submit is not
on PATH (library-only environments)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_jsonl(spark, tmp_path):
    from latyas_spark.fixtures import write_corpus

    d = str(tmp_path)
    write_corpus(d, n_docs=10, mega_every=0)
    docs = spark.read.parquet(f"{d}/documents.parquet").toPandas()
    jsonl = os.path.join(d, "documents.jsonl")
    os.makedirs(jsonl)
    with open(os.path.join(jsonl, "part-0.jsonl"), "w") as f:
        for _, r in docs.iterrows():
            f.write(
                json.dumps(
                    {"doc_id": r.doc_id, "spans": [dict(s) for s in r.spans]}
                )
                + "\n"
            )
    out = os.path.join(d, "out")
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--py-files", os.path.join(REPO, "dist/latyas_spark.zip"),
            os.path.join(REPO, "scripts/run_extract.py"),
            "--input", jsonl,
            "--sidecar", f"{d}/layout_blocks.parquet",
            "--output", out,
            "--buckets", "2",
        ],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "'buckets_done': 2" in proc.stdout
    spans = spark.read.parquet(os.path.join(out, "spans"))
    assert spans.count() > 0
    assert set(spans.columns) >= {"doc_id", "order", "kind", "text"}
