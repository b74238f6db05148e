"""Multi-format sources for the interleaved documents table.

The engine's input contract is one table shape (the north-rule
input_hint): ``(doc_id string, spans array<struct<kind string,
text string, media_ref string, offset int>>)``.  Production corpora
arrive in more than one container format — columnar parquet/Iceberg
for curated warehouses, JSON-lines for raw crawl interchange — so the
source layer normalizes any of them to that exact schema before the
extraction DAG sees a row.

Scale rules encoded here:

* **The schema is always explicit.**  ``spark.read.json`` without a
  schema runs a full inference pre-scan — at corpus scale that is a
  second pass over 100 TB before the first useful byte.  Supplying
  ``INTERLEAVED_SCHEMA`` makes ingest single-pass and also pins the
  span struct's field order (JSON objects are unordered; inference
  would alphabetize and silently reorder struct fields).
* **Corrupt records fail loudly by default.**  ``strict=True`` uses
  FAILFAST so a malformed crawl shard surfaces at ingest, not as a
  null doc_id joining nothing three stages later.  ``strict=False``
  uses PERMISSIVE and drops rows whose doc_id failed to parse (the
  crawl-hygiene mode: count them from the input-minus-output delta).
* Reference parity: the reference iterates a directory of files one
  process at a time (latyas/tools/pdf2text.py:24-43); here a path
  glob is a distributed scan and format is a property of the table,
  not of the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType(), True),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), True),
    ]
)

INTERLEAVED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), True),
        StructField("spans", ArrayType(SPAN_STRUCT), True),
    ]
)

_EXT_FMT = {
    ".parquet": "parquet",
    ".jsonl": "json",
    ".json": "json",
    ".ndjson": "json",
}


def _infer_format(path: str) -> str:
    p = path.rstrip("/").lower()
    for ext, fmt in _EXT_FMT.items():
        if p.endswith(ext):
            return fmt
    return "parquet"


def read_interleaved_docs(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    strict: bool = True,
) -> DataFrame:
    """Read an interleaved-documents table from ``path`` in ``fmt``
    ('parquet' or 'json'; inferred from the extension when omitted)
    and return it in exactly INTERLEAVED_SCHEMA, ready for
    ``extract_spans`` / ``warehouse.ingest_corpus``."""
    fmt = fmt or _infer_format(path)
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "json":
        reader = spark.read.schema(INTERLEAVED_SCHEMA).option(
            "mode", "FAILFAST" if strict else "PERMISSIVE"
        )
        df = reader.json(path)
        if not strict:
            df = df.filter(F.col("doc_id").isNotNull())
    else:
        raise ValueError(f"unsupported documents format: {fmt!r}")
    # Normalize to the contract: field order, span-struct field order,
    # offset width.  A no-op projection for already-conformant parquet
    # (Catalyst folds the casts), a real normalization for foreign
    # column order or int64 offsets.
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(
            "transform(spans, s -> struct(cast(s.kind as string) as kind,"
            " cast(s.text as string) as text,"
            " cast(s.media_ref as string) as media_ref,"
            " cast(s.offset as int) as offset))"
        ).alias("spans"),
    )
