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
# "direct" (raw parquet, input shuffle per run), "warehouse"
# (doc_id-bucketed tables, zero input exchange — the deployment plan;
# ingest excluded as the pay-once write cost), or "paired": all four
# legs (direct 8/32, warehouse 8/32) inside EVERY attempt, so the two
# feeds are compared within one host window — cross-campaign feed
# comparisons are confounded by window-to-window ceiling drift
# (observed 0.736-0.83), which pairing cancels.
FEED = os.environ.get("SPARK_GRAFT_SECONDARY_FEED", "direct")
# Width pair, e.g. "8,32" (default) or "4,16" — the 4->16 warehouse
# pair reruns through this exact audited path too
# (SPARK_GRAFT_SECONDARY_WIDTHS=4,16 SPARK_GRAFT_SECONDARY_FEED=warehouse).
WIDTHS = tuple(
    int(x)
    for x in os.environ.get("SPARK_GRAFT_SECONDARY_WIDTHS", "8,32").split(",")
)


def main() -> None:
    w_n, w_w = WIDTHS
    # the wide corpus keeps full-width walls >= ~45s; the narrow pair
    # uses the same corpus size the headline 4->16 rounds use
    n_docs = bench.BENCH_DOCS_WIDE if w_w >= 32 else bench.BENCH_DOCS
    corpus = bench._fixture_corpus(n_docs)
    attempts = []
    for a in range(MAX_ATTEMPTS):
        gate = bench._wait_for_quiet()
        feeds = ("direct", "warehouse") if FEED == "paired" else (FEED,)
        legs = {}
        for feed in feeds:
            legs[feed] = {
                w: bench._run_extraction(
                    f"local[{w}]", corpus, n_docs,
                    n_timed=1, monitor=True, feed=feed,
                )
                for w in (w_n, w_w)
            }
        valid = gate >= bench.QUIET_NOMINAL and all(
            bench._rate_ok(legs[f][w]["inrun_rate"], width=w)
            for f in feeds
            for w in (w_n, w_w)
        )
        r8, r32 = legs[feeds[-1]][w_n], legs[feeds[-1]][w_w]
        rec = {
            "attempt": a,
            "quiet_gate": gate,
            "valid": bool(valid),
            "efficiency": round(
                (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0, 3
            ),
            f"thr_local{w_n}": r8["docs_per_sec"],
            f"thr_local{w_w}": r32["docs_per_sec"],
            f"wall_local{w_n}": r8["wall_sec"],
            f"wall_local{w_w}": r32["wall_sec"],
            f"inrun_local{w_n}": r8["inrun_rate"],
            f"inrun_local{w_w}": r32["inrun_rate"],
        }
        if FEED == "paired":
            d8, d32 = legs["direct"][w_n], legs["direct"][w_w]
            rec["direct"] = {
                "efficiency": round(
                    (d32["docs_per_sec"] / d8["docs_per_sec"]) / 4.0, 3
                ),
                f"thr_local{w_n}": d8["docs_per_sec"],
                f"thr_local{w_w}": d32["docs_per_sec"],
                f"wall_local{w_n}": d8["wall_sec"],
                f"wall_local{w_w}": d32["wall_sec"],
                f"inrun_local{w_n}": d8["inrun_rate"],
                f"inrun_local{w_w}": d32["inrun_rate"],
            }
            # same-window feed dominance: warehouse/direct throughput
            rec[f"wh_speedup_{w_n}"] = round(
                r8["docs_per_sec"] / d8["docs_per_sec"], 3
            )
            rec[f"wh_speedup_{w_w}"] = round(
                r32["docs_per_sec"] / d32["docs_per_sec"], 3
            )
        attempts.append(rec)
        if sum(1 for x in attempts if x["valid"]) >= TARGET_VALID:
            break
    valid_attempts = [x for x in attempts if x["valid"]] or attempts
    by_eff = sorted(valid_attempts, key=lambda x: x["efficiency"])
    chosen = by_eff[len(by_eff) // 2]
    result = {
        "metric": f"secondary_{w_n}_{w_w}_efficiency",
        "feed": FEED,
        "value": chosen["efficiency"],
        "unit": "ratio",
        "valid": chosen["valid"],
        "n_valid": sum(1 for x in attempts if x["valid"]),
        "median_of_valid": chosen["efficiency"],
        "corpus_docs": n_docs,
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
