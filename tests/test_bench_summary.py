"""The bench summary line must survive the driver's tail capture.

The per-round driver records only the last 2000 characters of bench
stdout and parses the final JSON line out of that window; a line longer
than the window loses its head and parses to null (BENCH_r02).  These
tests pin build_summary_line against the REAL query registry so adding
a query can never silently push the line past the window again.
"""

from __future__ import annotations

import json

import bench
from latyas_spark.relational.registry import queries

DRIVER_TAIL_CHARS = 2000


def _scaling_stub() -> dict:
    return {
        "thr_local32": 23456.78,
        "efficiency": 0.869,
        "efficiency_4_16_wh": 0.77,
        "efficiency_8_32": 0.428,
        "efficiency_8_32_wh": 0.693,
    }


def test_summary_line_fits_tail_window_pessimistic():
    # Every registered query at a pessimistically wide timing value.
    qtimes = {name: 141.694 for name in queries()}
    line = bench.build_summary_line(qtimes, 5432.109, 0.1, _scaling_stub())
    assert len(line) + 2 <= DRIVER_TAIL_CHARS  # +2: leading \n + print's \n
    parsed = json.loads(line)
    assert parsed["metric"] == "bench_total_wall"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == len(queries())
    assert parsed["scaling_efficiency"] == 0.869
    assert parsed["extraction_docs_per_sec"] == 23456.78


def test_summary_line_keeps_slowest_queries_and_states_the_cut():
    # The kept set is the SLOWEST-N by time (stable rule), the cut is
    # explicit in queries_omitted, and n_queries stays the full count.
    qtimes = {name: float(i) for i, name in enumerate(sorted(queries()))}
    line = bench.build_summary_line(qtimes, 321.0, 0.1, _scaling_stub())
    parsed = json.loads(line)
    want = set(
        sorted(qtimes, key=lambda k: (-qtimes[k], k))[
            : bench.SUMMARY_TOP_QUERIES
        ]
    )
    assert set(parsed["queries"]) == want
    assert parsed["queries_omitted"] == len(queries()) - len(want)
    assert parsed["n_queries"] == len(queries())
    assert len(line) + 2 <= DRIVER_TAIL_CHARS


def test_summary_line_degrades_rather_than_overflows():
    # 400 long-named queries cannot fit; the guard must drop timings,
    # never a contract scalar, and never exceed the window.
    qtimes = {f"extremely_long_query_name_{i:03d}": 99.9 for i in range(400)}
    line = bench.build_summary_line(qtimes, 1.0, 0.01, None)
    assert len(line) + 2 <= DRIVER_TAIL_CHARS
    parsed = json.loads(line)
    assert parsed["n_queries"] == 400
    assert parsed["value"] == 1.0
    assert "scaling_efficiency" in parsed
