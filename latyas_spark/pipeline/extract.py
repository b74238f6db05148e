"""The distributed extraction job (flagship query).

Plan shape (SURVEY.md §3 lifecycle mapping):

    documents (nested spans)   layout_blocks (sidecar)
        |  posexplode               |
     repartition(P, doc_id)     repartition(P, doc_id)
        +--- shuffled-hash equi-join on (doc_id, offset) ---+
            (co-partitioned: the join adds NO exchange and
             its output stays doc_id-clustered)
                                |
          mapInPandas(whole-partition kernel: pandas lexsort by
          (doc_id, page, offset), then per-doc page extraction)
                                |
                       span rows / nested docs out

Scale design (SURVEY.md §4.3):

* **Batched kernels, not per-group calls.**  groupBy().applyInPandas
  invokes Python once per group; page groups are tiny (tens of rows),
  so per-group overhead would dominate at any scale.  Instead we
  repartition by hash(doc_id) and run ``mapInPandas`` over the whole
  task partition: one python invocation per partition, per-doc groups
  split off vectorized with flatnonzero on the sorted doc_id column.
* **Keep the JVM out of the hot path.**  Both join inputs are
  repartitioned by doc_id so the join itself needs no exchange
  (requires spark.sql.requireAllClusterKeysForCoPartition=false, set
  by build_session), the join is hash- not sort-merge- based, and the
  kernel sort happens vectorized in pandas — the JVM side of the
  kernel stage does shuffle IO and Arrow encoding only.  Measured at
  5.3M rows this removed ~230 JVM-CPU-seconds of wide-row sorting
  that serialized against the python workers inside one stage.
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

from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.document import (
    DEFAULT_CONFIG,
    ExtractConfig,
    extract_page,
    extract_page_dual,
)

# Columns the page kernel consumes.
KERNEL_COLS = [
    "doc_id", "page", "offset",
    "x1", "y1", "x2", "y2",
    "conf", "label", "text", "media_ref",
]

# Extra columns of the dual-source (pdf2txt.py) kernel: per-row OCR
# output and the row's text-layer rect in PDF coords (C7 source space).
DUAL_EXTRA_COLS = ["ocr_text", "lx1", "ly1", "lx2", "ly2"]

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
    slicing is zero-copy NumPy views, no pandas in the hot loop).
    Optional columns (multi-detector ``det``, dual-source ocr/layer
    cols) are extracted only when present in the frame."""

    __slots__ = ("doc_id", "page", "offset", "x1", "y1", "x2", "y2",
                 "conf", "label", "text", "media_ref", "n", "det",
                 "ocr_text", "lx1", "ly1", "lx2", "ly2")

    def __init__(self, pdf: pd.DataFrame):
        self.doc_id = pdf["doc_id"].to_numpy()
        self.page = pdf["page"].to_numpy()
        self.offset = pdf["offset"].to_numpy(dtype=np.int64)
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
        self.det = (
            pdf["det"].to_numpy(dtype=np.int64) if "det" in pdf.columns else None
        )
        self.ocr_text = (
            _clean_obj(pdf["ocr_text"]) if "ocr_text" in pdf.columns else None
        )
        for c in ("lx1", "ly1", "lx2", "ly2"):
            setattr(
                self,
                c,
                pdf[c].to_numpy(dtype=np.float64) if c in pdf.columns else None,
            )
        self.n = len(self.doc_id)


def _clean_obj(col: pd.Series) -> np.ndarray:
    arr = col.to_numpy(dtype=object)
    if len(arr) and col.isna().any():
        arr = arr.copy()
        arr[col.isna().to_numpy()] = None
    return arr


def _page_e1(cols: _Cols, ps: int, pe: int, cfg: ExtractConfig):
    """Flagship (E1, analyze_pdf) page call over one page slice."""
    return extract_page(
        cols.x1[ps:pe],
        cols.y1[ps:pe],
        cols.x2[ps:pe],
        cols.y2[ps:pe],
        cols.conf[ps:pe],
        cols.label[ps:pe],
        cols.text[ps:pe],
        cols.media_ref[ps:pe],
        cfg,
        det=None if cols.det is None else cols.det[ps:pe],
        offsets=cols.offset[ps:pe],
    )


def _page_dual(cols: _Cols, ps: int, pe: int, cfg: ExtractConfig):
    """Dual-source (E2, pdf2txt.py) page call over one page slice."""
    return extract_page_dual(
        cols.x1[ps:pe],
        cols.y1[ps:pe],
        cols.x2[ps:pe],
        cols.y2[ps:pe],
        cols.conf[ps:pe],
        cols.label[ps:pe],
        cols.ocr_text[ps:pe],
        cols.lx1[ps:pe],
        cols.ly1[ps:pe],
        cols.lx2[ps:pe],
        cols.ly2[ps:pe],
        cols.text[ps:pe],
        cfg,
    )


def _run_pages(cols: _Cols, s: int, e: int, cfg: ExtractConfig, page_fn=_page_e1):
    """Run page_fn per page of rows [s:e) of one doc (sorted by
    (page, ...)); yields (page, spans)."""
    pages = cols.page[s:e]
    bounds = np.flatnonzero(pages[1:] != pages[:-1]) + 1 + s
    starts = np.concatenate(([s], bounds))
    ends = np.concatenate((bounds, [e]))
    for ps, pe in zip(starts, ends):
        yield int(cols.page[ps]), page_fn(cols, ps, pe, cfg)


def _sorted_partition_chunks(
    batches: Iterator[pd.DataFrame], sort_cols: list
) -> Iterator[pd.DataFrame]:
    """Buffer the WHOLE task partition, sort it vectorized in pandas,
    and yield it as one doc-contiguous chunk.

    Sorting here instead of a JVM SortExec keeps the heavy lifting in
    the (independently parallel) Python workers: with sort-merge join
    upstream the JVM burned ~231 CPU-seconds on three wide-row sorts
    at 5.3M rows, serialized against the Python kernel inside one
    stage.  A whole-partition pandas lexsort of the same data costs
    <2s total.

    Memory envelope (the cost of whole-partition buffering): a kernel
    input row is ~250 B on the wire (4 float64 coords, conf, 3 short
    strings, ids) and ~3x that as pandas objects, so a task holds
    ~750 B x rows_per_partition.  At the bench shape (5.3M rows / 128
    partitions) that is ~31 MB/task — far under a worker's share.  At
    warehouse scale, size the kernel partition count as
    P >= total_rows * 750B / 512MB (e.g. 10^10 span rows -> P ~ 15k),
    via spark.sql.shuffle.partitions or bucketing; _kernel_partitions
    only enforces a floor of 4x cores.  Mega docs are page-salted
    before this point, so no partition is dominated by one document —
    the bound holds under document skew.
    """
    parts = [pdf for pdf in batches if len(pdf)]
    if not parts:
        return
    pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
    order = np.lexsort([pdf[c].to_numpy() for c in reversed(sort_cols)])
    if not np.array_equal(order, np.arange(len(order))):
        pdf = pdf.iloc[order].reset_index(drop=True)
    yield pdf


def _doc_mode_kernel(cfg: ExtractConfig, page_fn=_page_e1,
                     sort_cols=("doc_id", "page", "offset")):
    """mapInPandas fn: whole docs per chunk, doc-wide order in-kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for chunk in _sorted_partition_chunks(batches, list(sort_cols)):
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
                for _page, spans in _run_pages(cols, s, e, cfg, page_fn):
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


def _page_mode_kernel(cfg: ExtractConfig, page_fn=_page_e1,
                      sort_cols=("doc_id", "page", "offset")):
    """mapInPandas fn for the mega-doc path: emits page-local order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for chunk in _sorted_partition_chunks(batches, list(sort_cols)):
            cols = _Cols(chunk)
            out = {k: [] for k in
                   ("doc_id", "page", "page_pos", "kind", "text", "media_ref")}
            ids = cols.doc_id
            starts = np.concatenate(([0], np.flatnonzero(ids[1:] != ids[:-1]) + 1))
            ends = np.concatenate((starts[1:], [len(ids)]))
            for s, e in zip(starts, ends):
                for page, spans in _run_pages(cols, s, e, cfg, page_fn):
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


def doc_clustering_safe(spark) -> bool:
    """True iff a join whose children are hash(doc_id)-distributed (via
    repartition or bucketed scans) keeps its output doc_id-CLUSTERED in
    this session — the precondition for handing the join output to the
    doc-grouped kernel without a re-shuffle.

    Two session settings can silently break it: (a) subset cluster
    keys disallowed — EnsureRequirements re-shuffles on (doc_id,
    offset), which does NOT cluster by doc alone; (b) AQE skew-join
    splitting — it breaks a skewed join partition by mapper ranges,
    scattering one doc's rows across tasks (mega routing handles doc
    skew instead; build_session disables the splitter).  Callers fall
    back to an explicit kernel repartition when this returns False."""
    subset_ok = (
        spark.conf.get(
            "spark.sql.requireAllClusterKeysForCoPartition", "true"
        ).lower()
        == "false"
    )
    skew_split_on = (
        spark.conf.get("spark.sql.adaptive.enabled", "true").lower() == "true"
        and spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled", "false"
        ).lower()
        == "true"
    )
    return subset_ok and not skew_split_on


def _kernel_partitions(df: DataFrame) -> int:
    """Explicit shuffle width for the kernel stage.

    An explicit count keeps AQE from coalescing the exchange toward its
    64MB advisory size — the kernel is CPU-bound per row, not
    byte-bound, so byte-based coalescing would idle most cores.  4x the
    core count smooths stragglers (per-doc work varies by page count),
    trading a little Arrow-batch overhead for even task waves."""
    spark = df.sparkSession
    base = int(
        spark.conf.get(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism * 2),
        )
    )
    return max(base, spark.sparkContext.defaultParallelism * 4)


# Above this many mega doc ids, routing switches from a driver-side
# IN-list (pushed into both scans) to a broadcast semi/anti join: a fat
# skew tail would otherwise bloat the plan with a huge literal list.
MAX_MEGA_INLIST = 10_000


def _mode_parts(pruned: DataFrame, dual: bool):
    """(page_fn, sort_cols) for the kernel given the frame's columns.

    Multi-detector frames carry a ``det`` column; rows must then sort
    detector-major within a page (Layout.merge appends detector 2's
    blocks after detector 1's, base_pipeline.py:104-111) with offset as
    the in-detector order — a total, deterministic key either way.
    """
    page_fn = _page_dual if dual else _page_e1
    if "det" in pruned.columns:
        return page_fn, ("doc_id", "page", "det", "offset")
    return page_fn, ("doc_id", "page", "offset")


def _extract_doc_path(
    pruned: DataFrame,
    cfg: ExtractConfig,
    pre_partitioned: bool = False,
    dual: bool = False,
) -> DataFrame:
    """Doc-grouped kernel.  ``pre_partitioned=True`` promises the input
    is already hash(doc_id)-clustered (e.g. the output of a join whose
    children were repartitioned by doc_id), so only a partition-local
    sort is needed — no exchange."""
    if pre_partitioned:
        shaped = pruned
    else:
        shaped = pruned.repartition(_kernel_partitions(pruned), "doc_id")
    page_fn, sort_cols = _mode_parts(pruned, dual)
    return shaped.mapInPandas(
        _doc_mode_kernel(cfg, page_fn, sort_cols), schema=DOC_OUT_SCHEMA
    )


def _extract_page_path(
    pruned: DataFrame, cfg: ExtractConfig, dual: bool = False
) -> DataFrame:
    """Mega-doc path: page-salted kernel, then a distributed two-level
    doc-wide ordering.

    The naive ordering (row_number over partitionBy(doc_id)) would pull
    every output span of a mega doc through one task.  Instead the
    doc-wide order is ``page_base + page_pos`` where page_base is the
    exclusive running sum of per-page span counts: the window that
    computes it runs over PAGE-level rows (one per (doc, page) — a few
    hundred for a mega doc), and the join that applies it distributes
    on (doc_id, page).  No task ever holds more than one page of one
    doc.  The kernel output is localCheckpoint'ed (lazy) because both
    the count branch and the join branch consume it — without that the
    kernel would run twice.
    """
    # salt = page: mega docs spread across partitions by (doc_id, page)
    shaped = pruned.repartition(_kernel_partitions(pruned), "doc_id", "page")
    page_fn, sort_cols = _mode_parts(pruned, dual)
    pages = shaped.mapInPandas(
        _page_mode_kernel(cfg, page_fn, sort_cols), schema=PAGE_OUT_SCHEMA
    )
    pages = pages.localCheckpoint(eager=False)
    pcounts = pages.groupBy("doc_id", "page").agg(
        F.count(F.lit(1)).alias("n_spans")
    )
    wp = Window.partitionBy("doc_id").orderBy("page")
    bases = pcounts.select(
        "doc_id",
        "page",
        (F.sum("n_spans").over(wp) - F.col("n_spans")).alias("page_base"),
    )
    return (
        pages.join(bases, ["doc_id", "page"])
        .select(
            "doc_id",
            (F.col("page_base") + F.col("page_pos")).cast("int").alias("order"),
            "kind",
            "text",
            "media_ref",
        )
    )


def extract_pages(
    joined: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG, dual: bool = False
) -> DataFrame:
    """Page-granular extraction: the page-salted kernel WITHOUT the
    doc-wide order recovery — output keeps (page, page_pos).  Used by
    diagnostics and by the SQL-oracle-checkable flagship slice
    (registry.q_flagship_simple), where per-page positions are the
    comparable unit."""
    cols = list(KERNEL_COLS)
    if "det" in joined.columns:
        cols.append("det")
    if dual:
        cols += DUAL_EXTRA_COLS
    pruned = joined.select(*cols)
    shaped = pruned.repartition(_kernel_partitions(pruned), "doc_id", "page")
    page_fn, sort_cols = _mode_parts(pruned, dual)
    return shaped.mapInPandas(
        _page_mode_kernel(cfg, page_fn, sort_cols), schema=PAGE_OUT_SCHEMA
    )


def extract_spans_flat(
    joined: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    mega_threshold: int = MEGA_THRESHOLD,
    mega_ids: Optional[Sequence[str]] = None,
    pre_partitioned: bool = False,
    mega_ids_df: Optional[DataFrame] = None,
    dual: bool = False,
) -> DataFrame:
    """Extraction over an already-joined flat frame with KERNEL_COLS
    (plus ``det`` for multi-detector input, plus DUAL_EXTRA_COLS when
    ``dual=True``).

    Returns span rows (doc_id, order, kind, text, media_ref).  Docs
    with >= mega_threshold spans are routed to the page-salted path;
    pass ``mega_ids`` if the caller already knows them (e.g. from
    ``size(spans)``), else they are found with a count aggregation.
    Set ``mega_threshold=0`` to disable routing (all docs page path)
    or ``mega_threshold<0`` to force the doc path.
    ``pre_partitioned`` promises the frame is hash(doc_id)-clustered
    already, letting the normal-doc kernel skip its exchange.
    ``mega_ids_df`` (single ``doc_id`` column) routes via broadcast
    semi/anti joins instead of an IN-list — the fat-skew-tail fallback.
    """
    cols = list(KERNEL_COLS)
    if "det" in joined.columns:
        cols.append("det")
    if dual:
        cols += DUAL_EXTRA_COLS
    pruned = joined.select(*cols)
    if mega_threshold < 0:
        return _extract_doc_path(pruned, cfg, pre_partitioned, dual)
    if mega_threshold == 0:
        return _extract_page_path(pruned, cfg, dual)

    if mega_ids is None and mega_ids_df is None:
        counts = pruned.groupBy("doc_id").count()
        big = counts.filter(F.col("count") >= mega_threshold).select("doc_id")
        sample = big.limit(MAX_MEGA_INLIST + 1).collect()
        if len(sample) > MAX_MEGA_INLIST:
            mega_ids_df = big
        else:
            mega_ids = [r["doc_id"] for r in sample]

    if mega_ids_df is not None:
        normal = pruned.join(F.broadcast(mega_ids_df), "doc_id", "left_anti")
        mega = pruned.join(F.broadcast(mega_ids_df), "doc_id", "left_semi")
        return _extract_doc_path(normal, cfg, pre_partitioned, dual).unionByName(
            _extract_page_path(mega, cfg, dual)
        )

    if not mega_ids:
        return _extract_doc_path(pruned, cfg, pre_partitioned, dual)

    normal = pruned.filter(~F.col("doc_id").isin(list(mega_ids)))
    mega = pruned.filter(F.col("doc_id").isin(list(mega_ids)))
    return _extract_doc_path(normal, cfg, pre_partitioned, dual).unionByName(
        _extract_page_path(mega, cfg, dual)
    )


def extract_spans(
    documents: DataFrame,
    layout_blocks,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    mega_threshold: int = MEGA_THRESHOLD,
) -> DataFrame:
    """Flagship: nested documents + geometry sidecar(s) -> ordered spans.

    ``layout_blocks`` may be one DataFrame or a sequence of them (one
    per layout detector, U1 / layout.py:67-68: the paper pipeline runs
    2 detectors, paper_pipeline.py:21-33).  Multiple sidecars union by
    name with a ``det`` index; the kernel then replays Layout.merge
    order (detector-major) and the J1 overlap merge dedups the
    cross-detector duplicates.

    Mega-doc routing uses a driver-collected mega id list: the
    resulting ``doc_id IN (...)`` predicates are pushed by Catalyst
    through the join into BOTH parquet scans (InSet, O(1) probe), so
    each union branch scans and joins only its own documents.  A
    derived-column flag (``size(spans) >= T``) cannot be pushed below
    the join and was measured ~3x slower at 240k docs.  Mega docs are
    rare by definition (skew tail), so the collected list stays tiny —
    but a pathological fat tail (> MAX_MEGA_INLIST ids) would bloat the
    plan with a huge literal, so routing falls back to a broadcast
    semi/anti join of the id set past that threshold.
    """
    if isinstance(layout_blocks, DataFrame):
        sidecars = [layout_blocks]
    else:
        sidecars = list(layout_blocks)
    if len(sidecars) == 1:
        sidecar = sidecars[0]
    else:
        sidecar = sidecars[0].withColumn("det", F.lit(0).cast("int"))
        for i, s in enumerate(sidecars[1:], start=1):
            sidecar = sidecar.unionByName(
                s.withColumn("det", F.lit(i).cast("int"))
            )

    mega_ids: Optional[list] = None
    mega_ids_df: Optional[DataFrame] = None
    if mega_threshold > 0:
        # span count per doc from the PRIMARY flat sidecar: scans only
        # the doc_id column, map-side-combines, shuffles tiny partial
        # counts — far cheaper than size(spans), which would read the
        # whole nested spans column.
        counts = sidecars[0].groupBy("doc_id").count()
        big = counts.filter(F.col("count") >= mega_threshold).select("doc_id")
        sample = big.limit(MAX_MEGA_INLIST + 1).collect()
        if len(sample) > MAX_MEGA_INLIST:
            mega_ids_df = big
        else:
            mega_ids = [r["doc_id"] for r in sample]
    # Pre-partition BOTH join inputs by doc_id: HashPartitioning(doc_id)
    # satisfies the join's ClusteredDistribution(doc_id, offset), so the
    # join adds no exchange of its own AND its output stays clustered by
    # doc_id — the kernel then needs only a partition-local sort.  One
    # shuffle of each input instead of three of the joined width.  At
    # warehouse scale the same effect comes from bucketing both tables
    # by doc_id (warehouse.extract_from_warehouse — ZERO input shuffle);
    # this is the unbucketed equivalent.
    spark = documents.sparkSession
    subset_ok = doc_clustering_safe(spark)
    spans = explode_documents(documents)
    P = _kernel_partitions(spans)
    joined = spans.repartition(P, "doc_id").join(
        sidecar.repartition(P, "doc_id"), ["doc_id", "offset"]
    )
    return extract_spans_flat(
        joined,
        cfg,
        mega_threshold=mega_threshold,
        mega_ids=mega_ids,
        pre_partitioned=subset_ok,
        mega_ids_df=mega_ids_df,
    )


def extract_spans_preset(
    documents: DataFrame,
    layout_blocks,
    preset,
    mega_threshold: int = MEGA_THRESHOLD,
) -> DataFrame:
    """Flagship under a pipeline preset (paper/report/book): binds the
    preset's ExtractConfig (rule gate) and asserts the detector count
    matches the preset's model set (pipeline ctors, SURVEY.md §3)."""
    from .presets import Preset, get_preset

    if not isinstance(preset, Preset):
        preset = get_preset(preset)
    sidecars = (
        [layout_blocks] if isinstance(layout_blocks, DataFrame)
        else list(layout_blocks)
    )
    if len(sidecars) != preset.n_detectors:
        raise ValueError(
            f"preset {preset.name!r} binds {preset.n_detectors} layout "
            f"detector(s); got {len(sidecars)} sidecar(s)"
        )
    return extract_spans(
        documents, sidecars, cfg=preset.config, mega_threshold=mega_threshold
    )


def extract_spans_dual(
    documents: DataFrame,
    layout_blocks: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    mega_threshold: int = MEGA_THRESHOLD,
) -> DataFrame:
    """Dual-source (E2, pdf2txt.py) extraction: the sidecar additionally
    carries the per-row OCR output and the text-layer rect in PDF
    coords (DUAL_EXTRA_COLS); the kernel arbitrates OCR vs native text
    per block (levenshtein < 0.2 prefers native) after the C7
    flip+descale.  Same join/partitioning shape as extract_spans."""
    spark = documents.sparkSession
    subset_ok = (
        spark.conf.get(
            "spark.sql.requireAllClusterKeysForCoPartition", "true"
        ).lower()
        == "false"
    ) and not (
        spark.conf.get("spark.sql.adaptive.enabled", "true").lower() == "true"
        and spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled", "false"
        ).lower()
        == "true"
    )
    spans = explode_documents(documents)
    P = _kernel_partitions(spans)
    joined = spans.repartition(P, "doc_id").join(
        layout_blocks.repartition(P, "doc_id"), ["doc_id", "offset"]
    )
    return extract_spans_flat(
        joined,
        cfg,
        mega_threshold=mega_threshold,
        pre_partitioned=subset_ok,
        dual=True,
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
