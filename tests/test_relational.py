"""Fast relational-contract spot checks vs DuckDB at sf0.001.

The full 22-query contract is exercised by scripts/check_contract.py
(and by the driver at sf0.01); here we pin a representative subset so
`pytest -x -q` catches oracle drift early.
"""

import pandas as pd
import pytest

from latyas_spark.relational import registry as R

SUBSET = [
    "classify_counts",
    "containment_pairs",
    "dedup_exact",
    "token_stats",
    "sessionize",
    "grid_rank",
    "cosine_topk",
    "minhash_pairs",
    "simhash_buckets",
    "ngram_jaccard",
    "ann_ivf",
    "boilerplate_strip",
    "ocr_route",
    "quality_score",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9).astype(float)
        else:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, spark, sf001_dir, sf001_duck):
    fn, sql = R._REGISTRY[name]
    got = _normalize(fn(spark, sf001_dir).toPandas())
    want = _normalize(sf001_duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_every_query_has_callable_and_alignment():
    qs = R.queries()
    sqls = R.oracle_sql()
    assert set(sqls) <= set(qs)
    # every non-oracle query is documented as rows-only
    rows_only = set(qs) - set(sqls)
    assert rows_only == {"flagship_extract", "boilerplate_cetd", "mix_interleave"}


def test_no_per_row_python_udfs_anywhere():
    """North-rule invariant (SURVEY.md §7 step 4): no row-at-a-time
    Python UDFs in the engine — only Arrow-batched mapInPandas /
    applyInPandas kernels and JVM builtins."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "latyas_spark"
    bad = []
    for p in root.rglob("*.py"):
        src = p.read_text()
        if re.search(r"F\.udf\(|@udf\b|pandas_udf\(.*PandasUDFType\.SCALAR_ITER", src):
            bad.append(str(p))
    assert not bad, f"per-row/legacy UDF usage in: {bad}"
