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


# S8 visualization sink: RGB color per kind, from the reference's
# BLOCK_TYPE_COLOR_MAP (block.py:72-92; tuples read as RGB per the
# reference's own color comments).
KIND_COLOR = {
    "text": (255, 0, 0),
    "title": (0, 0, 255),
    "caption": (0, 255, 0),
    "figure": (255, 165, 0),
    "figurecaption": (128, 0, 128),
    "table": (255, 255, 0),
    "tablecaption": (0, 255, 255),
    "header": (255, 0, 255),
    "footer": (165, 42, 42),
    "reference": (255, 192, 203),
    "equation": (128, 128, 128),
    "embedeq": (100, 100, 100),
    "toc": (0, 128, 128),
    "list": (128, 128, 0),
    "icon": (0, 0, 0),
    "qrcode": (0, 128, 0),
    "barcode": (128, 0, 0),
    "textwithequation": (100, 100, 100),
    "unknown": (192, 192, 192),
}


def _color_col(kind_col: str):
    expr = None
    for kind, (r, g, b) in KIND_COLOR.items():
        rgb = F.lit(f"rgb({r},{g},{b})")
        expr = F.when(F.col(kind_col) == kind, rgb) if expr is None \
            else expr.when(F.col(kind_col) == kind, rgb)
    return expr.otherwise(F.lit("rgb(192,192,192)"))


def svg_overlay(blocks: DataFrame) -> DataFrame:
    """S8 visualization sink, Spark-native: per (doc_id, page) an SVG
    with one stroked rect per block plus a "kind-i" label at the box's
    top-right corner — the vector analog of the reference's
    cv2.rectangle/putText debug render (layout.py:175-200: int coords,
    thickness 2, label f"{kind}-{i}" at (x_2, y_1)).  Input needs
    doc_id, page, offset, x1..y2, kind columns.  Fully SQL-expressible
    (string building + ordered aggregation), so it stays JVM-side."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id", "page").orderBy("offset")
    color = _color_col("kind")
    ix = (F.row_number().over(w) - 1).cast("int")
    xi = F.floor("x1").cast("long")
    yi = F.floor("y1").cast("long")
    wi = (F.floor("x2") - F.floor("x1")).cast("long")
    hi = (F.floor("y2") - F.floor("y1")).cast("long")
    elem = F.concat(
        F.lit('<rect x="'), xi.cast("string"),
        F.lit('" y="'), yi.cast("string"),
        F.lit('" width="'), wi.cast("string"),
        F.lit('" height="'), hi.cast("string"),
        F.lit('" fill="none" stroke="'), color,
        F.lit('" stroke-width="2"/><text x="'),
        F.floor("x2").cast("long").cast("string"),
        F.lit('" y="'), yi.cast("string"),
        F.lit('" fill="'), color,
        F.lit('" font-size="16">'), F.col("kind"),
        F.lit("-"), ix.cast("string"), F.lit("</text>"),
    )
    per_block = blocks.select(
        "doc_id", "page", "offset",
        F.floor("x2").cast("long").alias("xmax"),
        F.floor("y2").cast("long").alias("ymax"),
        elem.alias("elem"),
    )
    return per_block.groupBy("doc_id", "page").agg(
        F.concat(
            F.lit('<svg xmlns="http://www.w3.org/2000/svg" width="'),
            F.max("xmax").cast("string"),
            F.lit('" height="'),
            F.max("ymax").cast("string"),
            F.lit('">'),
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(`offset`,"
                    " elem))), s -> s.elem)"
                ),
                "",
            ),
            F.lit("</svg>"),
        ).alias("svg")
    )


def write_svg_overlay(blocks: DataFrame, path: str) -> None:
    svg_overlay(blocks).write.mode("overwrite").json(path)
