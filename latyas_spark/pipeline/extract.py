"""The distributed extraction job (flagship query).

Plan shape (SURVEY.md §3 lifecycle mapping):

    documents (nested spans)            layout_blocks (sidecar)
        |  posexplode                        |
        +----------- equi-join on (doc_id, offset) ------------+
                                |
            repartition(hash(doc_id)) + sortWithinPartitions
                                |
               mapInPandas(partition-buffered page kernel)
                                |
                       span rows / nested docs out

Scale design (SURVEY.md §4.3):

* **Batched kernels, not per-group calls.**  groupBy().applyInPandas
  invokes Python once per group; page groups are tiny (tens of rows),
  so per-group overhead would dominate at any scale.  Instead we
  repartition by hash(doc_id), sort within partitions by
  (doc_id, page, offset), and run ``mapInPandas`` with a carry buffer
  that keeps the trailing (possibly batch-split) document for the next
  Arrow batch — one Python invocation per ~10k-row batch, contiguous
  groups split off with searchsorted.
* **Two-path skew routing.**  A mega-document (>= ``mega_threshold``
  spans) would serialize a whole partition in the doc-grouped path, so
  docs are routed by span count: normal docs take the single-shuffle
  doc path (reading order assigned inside the kernel); mega docs are
  re-keyed by (doc_id, page) — the salt — and their doc-wide order is
  recovered with a window over the (much smaller) span output.  The
  mega id set is obtained from a map-side-combined count (or free from
  ``size(spans)`` on the nested input) and is broadcast as an isin
  filter.
* **No per-row Python** anywhere; only the columns the kernel needs
  cross the Arrow boundary (pandas UDFs are a pushdown barrier, so
  cheap filters/pruning happen before the shuffle by construction).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.document import DEFAULT_CONFIG, ExtractConfig, extract_page

# Columns the page kernel consumes.
KERNEL_COLS = [
    "doc_id", "page", "offset",
    "x1", "y1", "x2", "y2",
    "conf", "label", "text", "media_ref",
]

DOC_OUT_SCHEMA = (
    "doc_id string, `order` int, kind string, text string, media_ref string"
)
PAGE_OUT_SCHEMA = (
    "doc_id string, page int, page_pos int, kind string, "
    "text string, media_ref string"
)

# Default span-count threshold for the mega-doc page path.
MEGA_THRESHOLD = 5000


class _Cols:
    """Column arrays of one kernel chunk (extracted once; all further
    slicing is zero-copy NumPy views, no pandas in the hot loop)."""

    __slots__ = ("doc_id", "page", "x1", "y1", "x2", "y2", "conf",
                 "label", "text", "media_ref", "n")

    def __init__(self, pdf: pd.DataFrame):
        self.doc_id = pdf["doc_id"].to_numpy()
        self.page = pdf["page"].to_numpy()
        self.x1 = pdf["x1"].to_numpy(dtype=np.float64)
        self.y1 = pdf["y1"].to_numpy(dtype=np.float64)
        self.x2 = pdf["x2"].to_numpy(dtype=np.float64)
        self.y2 = pdf["y2"].to_numpy(dtype=np.float64)
        self.conf = pdf["conf"].to_numpy(dtype=np.float64)
        self.label = pdf["label"].to_numpy()
        # Arrow->pandas string columns are object arrays with None for
        # nulls; a fully-null column can arrive as float NaN — normalize
        self.text = _clean_obj(pdf["text"])
        self.media_ref = _clean_obj(pdf["media_ref"])
        self.n = len(self.doc_id)


def _clean_obj(col: pd.Series) -> np.ndarray:
    arr = col.to_numpy(dtype=object)
    if len(arr) and col.isna().any():
        arr = arr.copy()
        arr[col.isna().to_numpy()] = None
    return arr


def _run_pages(cols: _Cols, s: int, e: int, cfg: ExtractConfig):
    """Run extract_page per page of rows [s:e) of one doc (sorted by
    (page, offset)); yields (page, spans)."""
    pages = cols.page[s:e]
    bounds = np.flatnonzero(pages[1:] != pages[:-1]) + 1 + s
    starts = np.concatenate(([s], bounds))
    ends = np.concatenate((bounds, [e]))
    for ps, pe in zip(starts, ends):
        spans = extract_page(
            cols.x1[ps:pe],
            cols.y1[ps:pe],
            cols.x2[ps:pe],
            cols.y2[ps:pe],
            cols.conf[ps:pe],
            cols.label[ps:pe],
            cols.text[ps:pe],
            cols.media_ref[ps:pe],
            cfg,
        )
        yield int(cols.page[ps]), spans


def _buffered_doc_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Re-chunk an iterator of sorted Arrow batches so that every
    yielded chunk contains only whole documents (the trailing doc of
    each batch is carried into the next)."""
    buf: Optional[pd.DataFrame] = None
    for pdf in batches:
        if buf is not None and len(buf):
            pdf = pd.concat([buf, pdf], ignore_index=True)
            buf = None
        if not len(pdf):
            continue
        ids = pdf["doc_id"].to_numpy()
        cut = int(np.searchsorted(ids, ids[-1], side="left"))
        if cut == 0:
            buf = pdf  # the whole batch is one (mega) doc; keep carrying
            continue
        buf = pdf.iloc[cut:]
        yield pdf.iloc[:cut]
    if buf is not None and len(buf):
        yield buf


def _doc_mode_kernel(cfg: ExtractConfig):
    """mapInPandas fn: whole docs per chunk, doc-wide order in-kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for chunk in _buffered_doc_batches(batches):
            cols = _Cols(chunk)
            out_doc, out_order, out_kind, out_text, out_media = [], [], [], [], []
            ids = cols.doc_id
            starts = np.concatenate(
                ([0], np.flatnonzero(ids[1:] != ids[:-1]) + 1)
            )
            ends = np.concatenate((starts[1:], [len(ids)]))
            for s, e in zip(starts, ends):
                doc_id = ids[s]
                pos = 0
                for _page, spans in _run_pages(cols, s, e, cfg):
                    for kind, text, media in spans:
                        out_doc.append(doc_id)
                        out_order.append(pos)
                        out_kind.append(kind)
                        out_text.append(text)
                        out_media.append(media)
                        pos += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype=object),
                    "order": pd.Series(out_order, dtype="int32"),
                    "kind": pd.Series(out_kind, dtype=object),
                    "text": pd.Series(out_text, dtype=object),
                    "media_ref": pd.Series(out_media, dtype=object),
                }
            )

    return run


def _page_mode_kernel(cfg: ExtractConfig):
    """mapInPandas fn for the mega-doc path: emits page-local order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for chunk in _buffered_doc_batches(batches):
            cols = _Cols(chunk)
            out = {k: [] for k in
                   ("doc_id", "page", "page_pos", "kind", "text", "media_ref")}
            ids = cols.doc_id
            starts = np.concatenate(([0], np.flatnonzero(ids[1:] != ids[:-1]) + 1))
            ends = np.concatenate((starts[1:], [len(ids)]))
            for s, e in zip(starts, ends):
                for page, spans in _run_pages(cols, s, e, cfg):
                    for pos, (kind, text, media) in enumerate(spans):
                        out["doc_id"].append(ids[s])
                        out["page"].append(page)
                        out["page_pos"].append(pos)
                        out["kind"].append(kind)
                        out["text"].append(text)
                        out["media_ref"].append(media)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype=object),
                    "page": pd.Series(out["page"], dtype="int32"),
                    "page_pos": pd.Series(out["page_pos"], dtype="int32"),
                    "kind": pd.Series(out["kind"], dtype=object),
                    "text": pd.Series(out["text"], dtype=object),
                    "media_ref": pd.Series(out["media_ref"], dtype=object),
                }
            )

    return run


def explode_documents(documents: DataFrame) -> DataFrame:
    """Nested input-hint table -> one row per span."""
    return documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def _kernel_partitions(df: DataFrame) -> int:
    """Explicit shuffle width for the kernel stage.

    An explicit count keeps AQE from coalescing the exchange toward its
    64MB advisory size — the kernel is CPU-bound per row, not
    byte-bound, so byte-based coalescing would idle most cores."""
    spark = df.sparkSession
    return int(
        spark.conf.get(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism * 2),
        )
    )


def _extract_doc_path(pruned: DataFrame, cfg: ExtractConfig) -> DataFrame:
    shaped = pruned.repartition(
        _kernel_partitions(pruned), "doc_id"
    ).sortWithinPartitions("doc_id", "page", "offset")
    return shaped.mapInPandas(_doc_mode_kernel(cfg), schema=DOC_OUT_SCHEMA)


def _extract_page_path(pruned: DataFrame, cfg: ExtractConfig) -> DataFrame:
    # salt = page: mega docs spread across partitions by (doc_id, page)
    shaped = pruned.repartition(
        _kernel_partitions(pruned), "doc_id", "page"
    ).sortWithinPartitions("doc_id", "page", "offset")
    pages = shaped.mapInPandas(_page_mode_kernel(cfg), schema=PAGE_OUT_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy("page", "page_pos")
    return pages.select(
        "doc_id",
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("order"),
        "kind",
        "text",
        "media_ref",
    )


def extract_spans_flat(
    joined: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    mega_threshold: int = MEGA_THRESHOLD,
    mega_ids: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Extraction over an already-joined flat frame with KERNEL_COLS.

    Returns span rows (doc_id, order, kind, text, media_ref).  Docs
    with >= mega_threshold spans are routed to the page-salted path;
    pass ``mega_ids`` if the caller already knows them (e.g. from
    ``size(spans)``), else they are found with a count aggregation.
    Set ``mega_threshold=0`` to disable routing (all docs page path)
    or ``mega_threshold<0`` to force the doc path.
    """
    pruned = joined.select(*KERNEL_COLS)
    if mega_threshold < 0:
        return _extract_doc_path(pruned, cfg)
    if mega_threshold == 0:
        return _extract_page_path(pruned, cfg)

    if mega_ids is None:
        counts = pruned.groupBy("doc_id").count()
        mega_ids = [
            r["doc_id"] for r in counts.filter(F.col("count") >= mega_threshold)
            .select("doc_id").collect()
        ]
    if not mega_ids:
        return _extract_doc_path(pruned, cfg)

    normal = pruned.filter(~F.col("doc_id").isin(list(mega_ids)))
    mega = pruned.filter(F.col("doc_id").isin(list(mega_ids)))
    return _extract_doc_path(normal, cfg).unionByName(
        _extract_page_path(mega, cfg)
    )


def extract_spans(
    documents: DataFrame,
    layout_blocks: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    mega_threshold: int = MEGA_THRESHOLD,
) -> DataFrame:
    """Flagship: nested documents + geometry sidecar -> ordered spans.

    Mega docs are detected for free from ``size(spans)`` on the nested
    side (no extra shuffle).  The (doc_id, offset) equi-join shuffles
    both sides on the same key; at warehouse scale both tables are
    bucketed by doc_id so this is a co-located join.
    """
    mega_ids: Optional[List[str]] = None
    if mega_threshold > 0:
        # span count from the flat sidecar: map-side-combined count over
        # a single string column — far cheaper than size(spans) on the
        # nested table, which would re-read the whole spans column
        counts = layout_blocks.groupBy("doc_id").count()
        mega_ids = [
            r["doc_id"]
            for r in counts.filter(F.col("count") >= mega_threshold)
            .select("doc_id")
            .collect()
        ]
    spans = explode_documents(documents)
    joined = spans.join(layout_blocks, ["doc_id", "offset"])
    return extract_spans_flat(
        joined, cfg, mega_threshold=mega_threshold, mega_ids=mega_ids
    )


def reassemble_documents(span_rows: DataFrame) -> DataFrame:
    """Span rows -> nested output table (same shape as the input hint,
    with `order` taking the place of `offset`)."""
    return (
        span_rows.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("order").alias("offset"),
                        "kind",
                        "text",
                        "media_ref",
                    )
                )
            ).alias("spans")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(spans, s -> struct(s.kind as kind, s.text as text,"
                " s.media_ref as media_ref, s.offset as offset))"
            ).alias("spans"),
        )
    )
