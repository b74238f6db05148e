"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction DAG (classify -> overlap
merge -> containment/texmix -> gather -> xy-cut reflow -> emission)
over a corpus derived deterministically from the driver's sf0.001
``events`` table.  ``queries()``/``oracle_sql()`` expose every operator
family from SURVEY.md §2 with DuckDB oracles (latyas_spark/relational/
registry.py documents the cross-engine determinism rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from latyas_spark.pipeline.adapter import synth_blocks
    from latyas_spark.pipeline.extract import extract_spans_flat

    return extract_spans_flat(synth_blocks(spark, "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    from latyas_spark.relational.registry import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible queries() entry.

    Four entries are deliberately rows-only (data-dependent recursion
    or tree/heap sweeps that ANSI SQL cannot express); each is pinned
    by an independent local implementation instead:

    * ``flagship_extract`` — xy-cut reading order; golden span-equality
      suite (tests/test_pipeline_spark.py) vs the pure-Python oracle
      port of the reference.
    * ``dual_extract`` — the pdf2txt.py dual-source variant (same
      xy-cut recursion); golden suite tests/test_dual_and_presets.py
      plus a Spark-vs-local equality pin; its SQL-expressible
      arbitration slice IS oracle-checked as ``dual_arbitrate``, and
      the WHOLE dual DAG is oracle-checked end-to-end on a
      recursion-degenerate family as ``dual_simple``.
    * ``boilerplate_cetd`` — CETD DOM-tree density strip;
      tests/test_boilerplate.py Spark-vs-local equality; the same
      kernel is oracle-checked end-to-end on a depth-1 family (where
      the tree recursion provably closes over one level) as
      ``cetd_simple`` and on a depth-2 / 7-node family (one real
      recursion step, two-level subtree folds) as ``cetd_depth2``.
    * ``mix_interleave`` — heap split/truncate interleave
      (mix_inference.py semantics); tests/test_mixkernel.py
      Spark-vs-local equality; the conflict-free slice is
      oracle-checked as ``mix_simple`` and the truncate branch
      (including the sweep's last-pair quirk) as ``mix_trunc``.
    """
    from latyas_spark.relational.registry import oracle_sql as _oracle

    return _oracle()
