"""Targeted rerun of the 8->32 secondary scaling pair only.

Reuses bench.py's corpus, extraction runner, quiet gate, in-run
monitor and validity rules (including the width-aware floor for
full-width legs) so the number is produced by the exact audited code
path — it just skips the ~45-min headline + 4->16 section.  Appends a
timestamped record to BENCH/SECONDARY.md and prints one JSON line.

Usage:  PYTHONPATH=/root/repo python scripts/bench_secondary.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

MAX_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_SECONDARY_ATTEMPTS", "6"))
# Collect several VALID attempts and report their MEDIAN: host speed
# drifts between the local[8] and local[32] legs of a single attempt
# (observed per-window busy-loop ceilings 0.754 vs 0.865 an hour
# apart), so one valid attempt is still a noisy ratio — same
# median-of-valid methodology as bench.py's 4->16 rounds.
TARGET_VALID = int(os.environ.get("SPARK_GRAFT_SECONDARY_VALID", "3"))
# "direct" (raw parquet, input shuffle per run) or "warehouse"
# (doc_id-bucketed tables, zero input exchange — the deployment plan;
# ingest excluded as the pay-once write cost).
FEED = os.environ.get("SPARK_GRAFT_SECONDARY_FEED", "direct")


def main() -> None:
    corpus = bench._fixture_corpus(bench.BENCH_DOCS_WIDE)
    attempts = []
    for a in range(MAX_ATTEMPTS):
        gate = bench._wait_for_quiet()
        r8 = bench._run_extraction(
            "local[8]", corpus, bench.BENCH_DOCS_WIDE, n_timed=1,
            monitor=True, feed=FEED,
        )
        r32 = bench._run_extraction(
            "local[32]", corpus, bench.BENCH_DOCS_WIDE, n_timed=1,
            monitor=True, feed=FEED,
        )
        valid = (
            gate >= bench.QUIET_NOMINAL
            and bench._rate_ok(r8["inrun_rate"], width=8)
            and bench._rate_ok(r32["inrun_rate"], width=32)
        )
        attempts.append(
            {
                "attempt": a,
                "quiet_gate": gate,
                "valid": bool(valid),
                "efficiency": round(
                    (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0, 3
                ),
                "thr_local8": r8["docs_per_sec"],
                "thr_local32": r32["docs_per_sec"],
                "wall_local8": r8["wall_sec"],
                "wall_local32": r32["wall_sec"],
                "inrun_local8": r8["inrun_rate"],
                "inrun_local32": r32["inrun_rate"],
            }
        )
        if sum(1 for x in attempts if x["valid"]) >= TARGET_VALID:
            break
    valid_attempts = [x for x in attempts if x["valid"]] or attempts
    by_eff = sorted(valid_attempts, key=lambda x: x["efficiency"])
    chosen = by_eff[len(by_eff) // 2]
    result = {
        "metric": "secondary_8_32_efficiency",
        "feed": FEED,
        "value": chosen["efficiency"],
        "unit": "ratio",
        "valid": chosen["valid"],
        "n_valid": sum(1 for x in attempts if x["valid"]),
        "median_of_valid": chosen["efficiency"],
        "wide_corpus_docs": bench.BENCH_DOCS_WIDE,
        "attempts": attempts,
        "cpu_ceiling": bench._cpu_ceiling(),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SECONDARY.md", "a") as f:
        f.write(
            f"\n## rerun @ {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}\n\n"
            f"```json\n{json.dumps(result, indent=1)}\n```\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
