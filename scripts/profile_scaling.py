"""Task-level decomposition of the 8->32 scaling gap (VERDICT r1 item 2).

The busy-loop ceiling in bench.py shows WHAT the host can scale; this
script shows WHERE the pipeline's 8->32 efficiency goes, from Spark's
own task metrics (event log), on the same 960k-doc corpus and the same
``extract_spans`` job the secondary bench pair times.

Identity used (thr = docs/wall, width ratio 8->32 = 4):

    eff = (thr_32/thr_8)/4 = wall_8 / (4 * wall_32)

and since wall = sum_task_run / (utilization * width):

    eff = (sum_run_8 / sum_run_32) * (util_32 / util_8)
          `-- work inflation --'     `-- scheduling loss --'

* ``sum_run`` = total executorRunTime over the timed pass's tasks: if
  it GROWS at width 32, each task's compute genuinely slowed down
  (all-core frequency droop / memory-bandwidth contention) — a hardware
  property a multi-node cluster does not share (32 executor cores there
  span machines).
* ``util`` = sum_run / (wall * width): if it DROPS at width 32, cores
  sat idle (stragglers, scheduling gaps, driver barriers) — a pipeline
  property that WOULD follow us to a real cluster.

Per-stage task histograms (p50/p95/max run time) localize any
straggler. Results -> BENCH/SCALING_PROFILE.md.

Usage:  python scripts/profile_scaling.py [n_docs]   (default 960000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses corpus, conf, quiet gate)

EVENT_DIR = "/tmp/spark-events-profile"


def _iter_lines(paths: list[str]):
    for p in paths:
        with open(p) as f:
            yield from f


def _percentile(xs: list[float], p: float) -> float:
    xs = sorted(xs)
    if not xs:
        return 0.0
    k = min(len(xs) - 1, int(round(p * (len(xs) - 1))))
    return xs[k]


def _run_profiled(
    master: str, corpus: str, n_docs: int, feed: str = "direct"
) -> dict:
    """One warm-up + one timed extraction pass with event log on.

    ``feed="direct"``: extract_spans over the raw parquet corpus (two
    repartition(doc_id) input exchanges).  ``feed="warehouse"``: the
    corpus is first ingested into doc_id-bucketed tables (ingest time
    excluded — it is the pay-once write-side cost), then the timed pass
    runs warehouse.extract_from_warehouse (ZERO input exchange)."""
    from latyas_spark.pipeline.extract import extract_spans
    from latyas_spark.pipeline.session import build_session

    os.makedirs(EVENT_DIR, exist_ok=True)
    conf = dict(bench.BENCH_CONF)
    conf.update({
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{EVENT_DIR}",
        "spark.eventLog.compress": "false",
    })
    width = int(master[master.find("[") + 1 : master.find("]")])
    spark = build_session(master=master, app_name=f"profile-{width}", extra_conf=conf)
    try:
        app_id = spark.sparkContext.applicationId
        if feed == "warehouse":
            from latyas_spark.pipeline.warehouse import (
                extract_from_warehouse,
                ingest_corpus,
            )

            spans_t, blocks_t = ingest_corpus(
                spark, corpus, n_buckets=128, prefix=f"prof{width}",
                base_path=f"/tmp/latyas_wh_{n_docs}_{width}",
            )
            run = lambda: bench._materialize(  # noqa: E731
                extract_from_warehouse(spark, spans_t, blocks_t)
            )
        else:
            docs = spark.read.parquet(f"{corpus}/documents.parquet")
            blocks = spark.read.parquet(f"{corpus}/layout_blocks.parquet")
            run = lambda: bench._materialize(  # noqa: E731
                extract_spans(docs, blocks)
            )
        run()  # warm-up
        t_mark_ms = time.time() * 1000.0
        t0 = time.perf_counter()
        run()
        wall = time.perf_counter() - t0
    finally:
        spark.stop()

    # Parse the event log: only tasks launched inside the timed pass.
    stages: dict[int, dict] = {}
    stage_names: dict[int, str] = {}
    totals = {"run_ms": 0.0, "cpu_ms": 0.0, "gc_ms": 0.0, "deser_ms": 0.0,
              "sh_read_ms": 0.0, "sh_write_ms": 0.0, "sh_wbytes": 0.0,
              "n_tasks": 0}
    # Spark 4 rolling layout: eventlog_v2_<appId>/events_*_<appId>;
    # single-file layout (<appId>[.inprogress]) kept as fallback.
    v2_dir = os.path.join(EVENT_DIR, f"eventlog_v2_{app_id}")
    if os.path.isdir(v2_dir):
        paths = sorted(
            os.path.join(v2_dir, p) for p in os.listdir(v2_dir)
            if p.startswith("events")
        )
    else:
        path = os.path.join(EVENT_DIR, app_id)
        if not os.path.exists(path):  # still .inprogress if stop() raced
            path += ".inprogress"
        paths = [path]
    for line in _iter_lines(paths):
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stage_names[si["Stage ID"]] = si.get("Stage Name", "?")
            elif kind == "SparkListenerTaskEnd":
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                if not tm or ti.get("Launch Time", 0) < t_mark_ms:
                    continue
                run = float(tm.get("Executor Run Time", 0))
                cpu = float(tm.get("Executor CPU Time", 0)) / 1e6
                gc = float(tm.get("JVM GC Time", 0))
                deser = float(tm.get("Executor Deserialize Time", 0))
                srm = (tm.get("Shuffle Read Metrics") or {})
                swm = (tm.get("Shuffle Write Metrics") or {})
                sh_r = float(srm.get("Fetch Wait Time", 0))
                sh_w = float(swm.get("Shuffle Write Time", 0)) / 1e6
                totals["run_ms"] += run
                totals["cpu_ms"] += cpu
                totals["gc_ms"] += gc
                totals["deser_ms"] += deser
                totals["sh_read_ms"] += sh_r
                totals["sh_write_ms"] += sh_w
                totals["sh_wbytes"] += float(
                    swm.get("Shuffle Bytes Written", 0)
                )
                totals["n_tasks"] += 1
                sid = ev.get("Stage ID")
                st = stages.setdefault(
                    sid,
                    {"runs": [], "fetch": [], "write": [], "rbytes": 0.0,
                     "name": stage_names.get(sid, "?")},
                )
                st["runs"].append(run)
                st["fetch"].append(sh_r)
                st["write"].append(sh_w)
                st["rbytes"] += float(
                    srm.get("Remote Bytes Read", 0)
                ) + float(srm.get("Local Bytes Read", 0))

    util = totals["run_ms"] / (wall * 1000.0 * width) if wall > 0 else 0.0
    stage_rows = []
    for sid in sorted(stages):
        runs = stages[sid]["runs"]
        stage_rows.append({
            "stage": sid,
            "tasks": len(runs),
            "sum_s": round(sum(runs) / 1000, 1),
            "p50_ms": round(_percentile(runs, 0.50)),
            "p95_ms": round(_percentile(runs, 0.95)),
            "max_ms": round(max(runs)),
            "fetch_s": round(sum(stages[sid]["fetch"]) / 1000, 1),
            "write_s": round(sum(stages[sid]["write"]) / 1000, 1),
            "read_mb": round(stages[sid]["rbytes"] / 1e6),
            "name": stages[sid]["name"].split(" at ")[0][:48],
        })
    return {
        "master": master, "width": width, "feed": feed,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "n_tasks": totals["n_tasks"],
        "sum_run_s": round(totals["run_ms"] / 1000, 1),
        "sum_cpu_s": round(totals["cpu_ms"] / 1000, 1),
        "sum_gc_s": round(totals["gc_ms"] / 1000, 1),
        "sum_deser_s": round(totals["deser_ms"] / 1000, 1),
        "sum_fetch_wait_s": round(totals["sh_read_ms"] / 1000, 1),
        "sum_shuffle_write_s": round(totals["sh_write_ms"] / 1000, 1),
        "shuffle_written_mb": round(totals["sh_wbytes"] / 1e6),
        "utilization": round(util, 3),
        "stages": stage_rows,
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else bench.BENCH_DOCS_WIDE
    corpus = bench._fixture_corpus(n_docs)
    quiet = bench._wait_for_quiet()
    # diagnostic mode: ONE master, stage table to stdout, no md rewrite
    only = os.environ.get("PROFILE_ONLY_MASTER")
    if only:
        r = _run_profiled(
            only, corpus, n_docs,
            feed=os.environ.get("PROFILE_FEED", "direct"),
        )
        print(json.dumps({k: v for k, v in r.items() if k != "stages"}))
        for s in r["stages"]:
            print(s)
        return
    results = {}
    for feed in ("direct", "warehouse"):
        for master in ("local[8]", "local[32]"):
            results[(feed, master)] = _run_profiled(
                master, corpus, n_docs, feed=feed
            )

    lines = [
        "# BENCH/SCALING_PROFILE.md — task-level 8->32 decomposition",
        "",
        f"- corpus: {n_docs} docs ({corpus}), quiet-gate {quiet} Miter/s,",
        "  one warm-up + one timed extraction pass per width and feed,",
        "  metrics from the Spark event log (timed pass's tasks only).",
        "- feeds: `direct` = extract_spans over raw parquet (two",
        "  repartition(doc_id) input exchanges); `warehouse` =",
        "  extract_from_warehouse over doc_id-bucketed tables (ZERO",
        "  input exchange — ingest excluded, it is the pay-once",
        "  write-side cost; SURVEY §4.3 target plan).",
        "- identity: eff = (sum_run_8/sum_run_32) x (util_32/util_8);",
        "  work inflation >1 = per-task compute slowed at width 32",
        "  (all-core frequency droop / memory-bandwidth contention —",
        "  single-host property; 32 cluster cores span machines);",
        "  util ratio <1 = cores idle (stragglers/scheduling — would",
        "  follow the pipeline to a real cluster).",
        "- fetch wait and shuffle write are reported SEPARATELY: round",
        "  2's single 'shuffle wait' number lumped them, and the r2",
        "  8->32 growth (5.5s -> 103.8s) turned out to be 100% WRITE",
        "  time (fetch wait is 0.0s at both widths — in local mode",
        "  every block is process-local).  Shuffle write at width 32",
        "  goes to one host's tmpfs from 32 concurrent writers; on a",
        "  real cluster the same 32 cores span 4+ machines writing to",
        "  4+ local disks, so this term is a single-host artifact —",
        "  and the warehouse feed removes the bytes themselves.",
        "",
    ]
    for feed in ("direct", "warehouse"):
        r8 = results[(feed, "local[8]")]
        r32 = results[(feed, "local[32]")]
        eff = round((r32["docs_per_sec"] / r8["docs_per_sec"]) / 4, 3)
        work_inflation = (
            round(r32["sum_run_s"] / r8["sum_run_s"], 3)
            if r8["sum_run_s"] else None
        )
        util_ratio = (
            round(r32["utilization"] / r8["utilization"], 3)
            if r8["utilization"] else None
        )
        lines += [
            f"## feed = {feed}",
            "",
            "| metric | local[8] | local[32] |",
            "|---|---|---|",
            f"| wall (s) | {r8['wall_s']} | {r32['wall_s']} |",
            f"| docs/sec | {r8['docs_per_sec']} | {r32['docs_per_sec']} |",
            f"| tasks | {r8['n_tasks']} | {r32['n_tasks']} |",
            f"| sum task run (s) | {r8['sum_run_s']} | {r32['sum_run_s']} |",
            f"| sum JVM cpu (s) | {r8['sum_cpu_s']} | {r32['sum_cpu_s']} |",
            f"| sum GC (s) | {r8['sum_gc_s']} | {r32['sum_gc_s']} |",
            f"| sum deserialize (s) | {r8['sum_deser_s']} | {r32['sum_deser_s']} |",
            f"| sum fetch wait (s) | {r8['sum_fetch_wait_s']} | {r32['sum_fetch_wait_s']} |",
            f"| sum shuffle write (s) | {r8['sum_shuffle_write_s']} | {r32['sum_shuffle_write_s']} |",
            f"| shuffle bytes written (MB) | {r8['shuffle_written_mb']} | {r32['shuffle_written_mb']} |",
            f"| core utilization | {r8['utilization']} | {r32['utilization']} |",
            "",
            f"**efficiency (thr_32/thr_8)/4 = {eff}** = work-inflation"
            f" {work_inflation} (8->32 total-compute ratio;"
            f" {round(1/work_inflation, 3) if work_inflation else '?'}x slowdown)"
            f" x utilization-ratio {util_ratio}",
            "",
        ]
        for r in (r8, r32):
            lines += [f"### {feed} / {r['master']} stages (timed pass)", "",
                      "| stage | tasks | sum s | p50 ms | p95 ms | max ms "
                      "| fetch wait s | shuffle write s | shuffle read MB "
                      "| name |",
                      "|---|---|---|---|---|---|---|---|---|---|"]
            lines += [
                f"| {s['stage']} | {s['tasks']} | {s['sum_s']} | {s['p50_ms']} "
                f"| {s['p95_ms']} | {s['max_ms']} | {s['fetch_s']} "
                f"| {s['write_s']} | {s['read_mb']} | {s['name']} |"
                for s in r["stages"]
            ]
            lines.append("")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "SCALING_PROFILE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
