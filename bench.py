"""Bench harness (driver contract).

Runs headline relational queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], then measures flagship extraction throughput
on the deterministic fixture corpus at TWO parallelism levels —
local[8] and local[32], the sandbox stand-in for N vs 4N executors —
and reports the scaling efficiency (thr_32 / thr_8) / 4 required >= 0.8
by BASELINE.json.  Prints ONE JSON line and refreshes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "240000"))
SKIP_SCALING = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") == "1"

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "topk_orders",
    "page_assembly",
    "sessionize",
    "grid_rank",
    "overlap_pairs",
    "containment_pairs",
    "ship_window_pairs",
    "classify_counts",
    "union_dedup",
    "levenshtein_arbitration",
    "dedup_exact",
    "minhash_pairs",
    "simhash_buckets",
    "cosine_topk",
    "token_stats",
    "fingerprint",
    "flagship_extract",
]


def _materialize(df) -> int:
    # noop sink: full materialization, no IO, no column pruning shortcut
    df.write.format("noop").mode("overwrite").save()
    return 0


def _bench_queries(spark) -> dict:
    from latyas_spark.relational.registry import queries

    qs = queries()
    out = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        _materialize(fn(spark, SF_DIR))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def _fixture_corpus(n_docs: int) -> str:
    """Generate (once, in parallel via Spark) the bench corpus."""
    d = f"/tmp/latyas_bench_corpus_{n_docs}"
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        from latyas_spark.fixtures import write_corpus_spark
        from latyas_spark.pipeline.session import build_session

        spark = build_session(master=f"local[{CPUS}]", app_name="bench-gen")
        try:
            write_corpus_spark(spark, d, n_docs=n_docs, mega_every=97)
        finally:
            spark.stop()
        with open(marker, "w") as f:
            f.write("ok")
    return d


def _run_extraction(master: str, corpus: str, n_docs: int) -> dict:
    """Fresh session at the given parallelism; returns docs/sec."""
    from latyas_spark.pipeline.extract import extract_spans
    from latyas_spark.pipeline.session import build_session

    spark = build_session(master=master, app_name=f"bench-{master}")
    try:
        docs = spark.read.parquet(f"{corpus}/documents.parquet")
        blocks = spark.read.parquet(f"{corpus}/layout_blocks.parquet")
        # warm-up (JVM + python worker pool), excluded from timing —
        # mirrors the reference's warm-up exclusion (det_model/
        # inference.py:117-121)
        _materialize(extract_spans(docs.limit(64), blocks))
        t0 = time.perf_counter()
        _materialize(extract_spans(docs, blocks))
        wall = time.perf_counter() - t0
        return {"master": master, "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 2)}
    finally:
        spark.stop()


def _write_report(result: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    sc = result.get("scaling") or {}
    lines = [
        "# BENCH/BASELINE.md — measured numbers (latest bench.py run)",
        "",
        f"- sf dir: `{SF_DIR}`, headline engine: `local[{CPUS}]`",
        f"- extraction corpus: {BENCH_DOCS} fixture docs "
        "(crc32-seeded, FIXTURES.md §1-2)",
        "",
        "## Extraction throughput — two parallelism levels "
        "(N vs 4N executor stand-in)",
        "",
        "| config | wall (s) | docs/sec |",
        "|---|---|---|",
    ]
    for r in sc.get("runs", []):
        lines.append(f"| {r['master']} | {r['wall_sec']} | {r['docs_per_sec']} |")
    if "efficiency" in sc:
        lines += [
            "",
            f"**Scaling efficiency (thr_32/thr_8)/4 = {sc['efficiency']}** "
            "(required >= 0.8, BASELINE.json)",
        ]
    lines += ["", "## Headline query timings (sec)", ""]
    for k, v in result["queries"].items():
        lines.append(f"- {k}: {v}")
    lines += ["", f"Total bench wall: {result['value']} {result['unit']}"]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    t_start = time.perf_counter()

    from latyas_spark.pipeline.session import build_session

    spark = build_session(master=f"local[{CPUS}]", app_name="bench-headline")
    try:
        qtimes = _bench_queries(spark)
    finally:
        spark.stop()

    scaling = None
    if not SKIP_SCALING:
        corpus = _fixture_corpus(BENCH_DOCS)
        runs = [
            _run_extraction("local[8]", corpus, BENCH_DOCS),
            _run_extraction("local[32]", corpus, BENCH_DOCS),
        ]
        thr8 = runs[0]["docs_per_sec"]
        thr32 = runs[1]["docs_per_sec"]
        scaling = {
            "runs": runs,
            "thr_local8": thr8,
            "thr_local32": thr32,
            "efficiency": round((thr32 / thr8) / 4.0, 3),
        }

    total = round(time.perf_counter() - t_start, 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    result = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_val,
        "extraction_docs_per_sec": (scaling or {}).get("thr_local32"),
        "scaling": scaling,
    }
    _write_report(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
