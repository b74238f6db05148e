"""Diagnostic sinks (SURVEY.md §2.1 S6/S7).

* ``write_page_texts`` — the reference's text sink: per-document text
  with ordered spans joined by "\\n\\n\\n" (latyas/tools/pdf2text.py:59-62).
* ``write_labelme`` — the reference's annotation sink: one LabelMe JSON
  record per page with rectangle shapes (auto_labelme.py:36-62),
  emitted as a JSON-lines dataset via ``df.write.json`` (distributed,
  one record per row — the Spark analog of one file per image).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def page_texts(span_rows: DataFrame, separator: str = "\n\n\n") -> DataFrame:
    """Ordered span texts joined per document (pdf2text.py:62 uses
    "\\n\\n\\n" between pages; pdf2txt.py:113 uses "\\n====\\n")."""
    return (
        span_rows.filter(F.col("text").isNotNull())
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(`order`, text))),"
                    " s -> s.text)"
                ),
                separator,
            ).alias("text")
        )
    )


def write_page_texts(span_rows: DataFrame, path: str, separator: str = "\n\n\n") -> None:
    page_texts(span_rows, separator).write.mode("overwrite").parquet(path)


def labelme_records(blocks: DataFrame) -> DataFrame:
    """Blocks -> LabelMe-shaped records (auto_labelme.py:36-62): shapes
    carry label + two-point rectangle; imagePath derives from the page
    identity; imageData null (no raster in the span model)."""
    shape = F.struct(
        F.col("label").alias("label"),
        F.array(
            F.array(F.col("x1"), F.col("y1")),
            F.array(F.col("x2"), F.col("y2")),
        ).alias("points"),
        F.lit("rectangle").alias("shape_type"),
        F.lit(None).cast("string").alias("group_id"),
    )
    return (
        blocks.groupBy("doc_id", "page")
        .agg(F.collect_list(shape).alias("shapes"))
        .select(
            F.lit("5.0.1").alias("version"),
            "shapes",
            F.concat(
                F.col("doc_id"), F.lit("_p"), F.col("page").cast("string"),
                F.lit(".png"),
            ).alias("imagePath"),
            F.lit(None).cast("string").alias("imageData"),
        )
    )


def write_labelme(blocks: DataFrame, path: str) -> None:
    labelme_records(blocks).write.mode("overwrite").json(path)
