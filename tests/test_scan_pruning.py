"""Parquet-scan pruning guards: the docstrings claim filters reach the
scan and projections prune columns — pin it in the executed plan so a
refactor that widens a scan (reads all columns for a 2-column query)
or strands a filter above the scan fails here, not in a 100 TB run.
"""

import re

from latyas_spark.relational import registry as R


def _scan_lines(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [ln.strip() for ln in plan.splitlines() if "FileScan" in ln]


def test_confidence_filter_pushes_predicate_and_prunes(spark, sf001_dir):
    """F1's >0.3 gate must reach the events scan (at minimum the
    IsNotNull guard lands in PushedFilters; the derived-expression
    part stays in DataFilters at the scan) and the scan must not read
    the wide `props` column."""
    scans = _scan_lines(R.q_confidence_filter(spark, sf001_dir))
    ev = [s for s in scans if "events.parquet" in s]
    assert ev, scans
    assert "PushedFilters: [IsNotNull" in ev[0]
    assert "props" not in ev[0]


def test_dedup_exact_reads_two_columns(spark, sf001_dir):
    """The exact-dedup scan needs doc_id + text and NOTHING else —
    at corpus scale every stray column is terabytes of read."""
    scans = _scan_lines(R.q_dedup_exact(spark, sf001_dir))
    doc = [s for s in scans if "documents.parquet" in s]
    assert doc, scans
    m = re.search(r"ReadSchema: struct<([^>]*)>", doc[0])
    assert m, doc[0]
    cols = sorted(f.split(":")[0] for f in m.group(1).split(","))
    assert cols == ["doc_id", "text"]


def test_corpus_profile_prunes_to_lang_text(spark, sf001_dir):
    """The profiling report groups on lang over tokenized text; the
    scan must read exactly those two columns."""
    scans = _scan_lines(R.q_corpus_profile(spark, sf001_dir))
    doc = [s for s in scans if "documents.parquet" in s]
    assert doc, scans
    m = re.search(r"ReadSchema: struct<([^>]*)>", doc[0])
    cols = sorted(f.split(":")[0] for f in m.group(1).split(","))
    assert cols == ["lang", "text"]
