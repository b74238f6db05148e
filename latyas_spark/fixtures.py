"""Deterministic synthetic corpus generator (FIXTURES.md §1-§3).

Produces the engine's input tables exactly per BASELINE.json input_hint:

  documents(doc_id string,
            spans array<struct<kind string, text string,
                               media_ref string, offset int>>)
  layout_blocks(doc_id string, offset int, page int,
                x1 double, y1 double, x2 double, y2 double,
                conf double, label string)

Everything is seeded from ``crc32(doc_id)`` — no wall clock, no global
RNG — so any scale factor regenerates bit-identically.  Page layouts
are drawn from archetypes that deliberately exercise every kernel edge:

  * single/two-column stacks (clean xy-cuts)
  * header/footer bands
  * figure + caption pairs (media spans)
  * near-duplicate overlapping boxes  -> overlap merge (J1)
  * embedded equations inside a text block -> containment + texmix
  * isolated display equations and tables
  * a mutually-overlapping "pinwheel" cluster with no valid cut on
    either axis -> forces the depth>8 grid-sort fallback (R2)
  * raw detector labels including the from_str quirks
    ("textwithequation" -> text, "figure_caption", "TOC", junk)
  * sub-0.3-confidence detections (dropped blocks whose native text
    still feeds the text-layer gather)
  * CJK cross-reference snippets for the pdf2txt filters
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Optional

import numpy as np

WORDS = (
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt labore "
    "spark arrow batch kernel shuffle partition salted lineage span "
    "document layout block region reading order cut margin depth"
).split()

CJK_SNIPPETS = [
    "图3展示了总体结构",
    "表1给出了统计结果",
    "详见图二所示的流程",
    "结果见表五与附录",
    "本文方法见图1的说明",
]

LATEX_SNIPPETS = [
    r"E = mc^2",
    r"\sum_{i=1}^n x_i",
    r"\frac{a+b}{c}",
    r"\int_0^1 f(x) dx",
    r"\alpha + \beta = \gamma",
    r"x^2 + y^2 = r^2",
]

# raw detector labels per target kind, including from_str quirk forms
LABELS_BY_KIND: Dict[str, List[str]] = {
    "text": ["text", "Text", "text_block", "textwithequation"],
    "title": ["title", "Title", "doc-title"],
    "caption": ["caption", "Caption"],
    "figurecaption": ["figure_caption", "caption-figure"],
    "tablecaption": ["table_caption", "caption of table"],
    "figure": ["figure", "Figure"],
    "table": ["table", "Table"],
    "header": ["header", "page-header"],
    "footer": ["footer", "page-footer"],
    "reference": ["reference", "References"],
    "equation": ["equation", "equation_isolated", "isolated equation"],
    "embedeq": ["embedeq", "embedeq_inline"],
    "toc": ["TOC", "toc"],
    "list": ["list", "List"],
    "icon": ["icon"],
    "qrcode": ["qrcode", "QRCode"],
    "barcode": ["barcode"],
    "unknown": ["blob", "mystery", "widget"],
}

MEDIA_KINDS = {"figure", "icon", "qrcode", "barcode"}

# Dual-source (pdf2txt.py) coordinate constants — must equal the
# ExtractConfig defaults: detection bboxes are generated in render
# coords (scale x2, y down); the text-layer rect of each row is its C7
# image in PDF coords (y up) plus a small deterministic jitter.
RENDER_SCALE = 2.0
PAGE_H = 1100.0


def doc_seed(doc_id: str) -> int:
    return zlib.crc32(doc_id.encode("utf-8")) & 0xFFFFFFFF


def _row_hash(doc_id: str, page: int, idx: int, text: Optional[str]) -> int:
    """Per-row deterministic hash, independent of the archetype rng
    stream (adding dual-source fields must not perturb the geometry the
    round-1 goldens pin)."""
    return zlib.crc32(f"{doc_id}|{page}|{idx}|{text or ''}".encode("utf-8"))


def _ocr_text_for(text: Optional[str], h: int) -> Optional[str]:
    """OCR-model output stand-in: mostly near-faithful (1-char
    substitution — arbitration keeps the native text layer), sometimes
    badly garbled (reversed — relative distance >= 0.2, arbitration
    trusts OCR, pdf2txt.py:84-88 semantics)."""
    if text is None:
        return None
    if h % 5 == 0:
        return text[::-1]
    p = h % len(text)
    sub = chr(97 + (h >> 6) % 26)
    return text[:p] + sub + text[p + 1:]


def _layer_rect_for(
    x1: float, y1: float, x2: float, y2: float, h: int
) -> tuple:
    """Text-layer rect in PDF coords: the C7 inverse of the detection
    bbox (x/rs, PAGE_H - y/rs with y1/y2 swapping under the flip) plus
    a +-2px deterministic jitter, so a kernel that forgets the flip or
    the descale gathers nothing."""
    jx = (h % 5) - 2.0
    jy = ((h >> 3) % 5) - 2.0
    return (
        x1 / RENDER_SCALE + jx,
        PAGE_H - y2 / RENDER_SCALE + jy,
        x2 / RENDER_SCALE + jx,
        PAGE_H - y1 / RENDER_SCALE + jy,
    )


def _sentence(rng: np.random.RandomState, lo=4, hi=12) -> str:
    k = int(rng.randint(lo, hi))
    return " ".join(WORDS[rng.randint(0, len(WORDS))] for _ in range(k))


class _PageBuilder:
    def __init__(self, rng: np.random.RandomState, doc_id: str, page: int):
        self.rng = rng
        self.doc_id = doc_id
        self.page = page
        self.rows: List[dict] = []
        self.media_counter = 0

    def _conf(self, low_ok: bool = True) -> float:
        # ~8% of detections fall under the 0.3 cut when allowed
        if low_ok and self.rng.random_sample() < 0.08:
            return round(0.05 + 0.2 * self.rng.random_sample(), 3)
        return round(0.35 + 0.6 * self.rng.random_sample(), 3)

    def add(
        self,
        kind: str,
        x1: float,
        y1: float,
        x2: float,
        y2: float,
        text: Optional[str] = None,
        conf: Optional[float] = None,
        label: Optional[str] = None,
    ) -> dict:
        rng = self.rng
        if label is None:
            variants = LABELS_BY_KIND[kind]
            label = variants[rng.randint(0, len(variants))]
        media_ref = None
        if kind in MEDIA_KINDS:
            media_ref = f"media://{self.doc_id}/{self.page}-{self.media_counter}"
            self.media_counter += 1
            text = None
        elif text is None:
            text = _sentence(rng)
        h = _row_hash(self.doc_id, self.page, len(self.rows), text)
        lx1, ly1, lx2, ly2 = _layer_rect_for(
            float(x1), float(y1), float(x2), float(y2), h
        )
        row = {
            "doc_id": self.doc_id,
            "page": self.page,
            "offset": -1,  # assigned doc-wide later
            "x1": float(x1),
            "y1": float(y1),
            "x2": float(x2),
            "y2": float(y2),
            "conf": float(conf) if conf is not None else self._conf(),
            "label": label,
            "kind": kind,
            "text": text,
            "media_ref": media_ref,
            "ocr_text": _ocr_text_for(text, h),
            "lx1": lx1,
            "ly1": ly1,
            "lx2": lx2,
            "ly2": ly2,
        }
        self.rows.append(row)
        return row

    # --- archetypes -----------------------------------------------------

    def column(self, x_left: float, x_right: float, y0: float, n_blocks: int):
        y = y0
        rng = self.rng
        for _ in range(n_blocks):
            h = float(rng.randint(30, 90))
            kind = ["text", "text", "text", "title", "list", "reference"][
                rng.randint(0, 6)
            ]
            self.add(kind, x_left, y, x_right, y + h)
            y += h + float(rng.randint(10, 30))
        return y

    def near_duplicate(self):
        """Two heavily-overlapping text boxes -> merge path."""
        rng = self.rng
        x, y = float(rng.randint(80, 300)), float(rng.randint(700, 820))
        w, h = float(rng.randint(150, 300)), float(rng.randint(40, 70))
        base = self.add("text", x, y, x + w, y + h)
        jx, jy = float(rng.randint(0, 6)), float(rng.randint(0, 6))
        self.add(
            ["text", "title"][rng.randint(0, 2)],
            x + jx, y + jy, x + w + jx, y + h + jy,
            text=base["text"],
        )

    def figure_with_caption(self, x: float, y: float):
        rng = self.rng
        w, h = float(rng.randint(150, 280)), float(rng.randint(120, 220))
        self.add("figure", x, y, x + w, y + h, conf=self._conf(low_ok=False))
        self.add("figurecaption", x, y + h + 10, x + w, y + h + 40)
        return y + h + 50

    def equation_block(self, x: float, y: float):
        rng = self.rng
        w = float(rng.randint(200, 380))
        tex = LATEX_SNIPPETS[rng.randint(0, len(LATEX_SNIPPETS))]
        self.add("equation", x, y, x + w, y + 40, text=tex,
                 conf=self._conf(low_ok=False))
        return y + 55

    def text_with_embedded_eq(self, x: float, y: float):
        """A wide text block containing 1-2 inline equations."""
        rng = self.rng
        w, h = 420.0, 60.0
        blk = self.add(
            "text", x, y, x + w, y + h, conf=self._conf(low_ok=False)
        )
        n_eq = int(rng.randint(1, 3))
        # equations strictly inside, spread across the width
        slot_w = w / (n_eq + 1)
        for e in range(n_eq):
            ex = x + slot_w * (e + 1) - 30
            tex = LATEX_SNIPPETS[rng.randint(0, len(LATEX_SNIPPETS))]
            self.add(
                "embedeq", ex, y + 15, ex + 60, y + 45, text=tex,
                conf=self._conf(low_ok=False),
            )
        return y + h + 20

    def pinwheel(self, x: float, y: float):
        """Mutually-overlapping ring: no valid cut on either axis."""
        s = 40.0
        self.add("text", x, y, x + 3 * s, y + s, conf=0.9)
        self.add("text", x + 2 * s, y + 0.5 * s, x + 3.5 * s, y + 3 * s, conf=0.9)
        self.add("text", x + 0.5 * s, y + 2 * s, x + 3 * s, y + 3.5 * s, conf=0.9)
        self.add("text", x - 0.5 * s, y + 0.5 * s, x + s, y + 3 * s, conf=0.9)

    def table_block(self, x: float, y: float):
        rng = self.rng
        w, h = float(rng.randint(250, 400)), float(rng.randint(100, 180))
        cells = " | ".join(_sentence(rng, 1, 3) for _ in range(4))
        self.add("table", x, y, x + w, y + h, text=cells,
                 conf=self._conf(low_ok=False))
        self.add("tablecaption", x, y - 35, x + w, y - 10)
        return y + h + 20

    def cjk_snippet(self, x: float, y: float):
        snip = CJK_SNIPPETS[self.rng.randint(0, len(CJK_SNIPPETS))]
        self.add("text", x, y, x + 200, y + 30, text=snip)
        return y + 45


def build_page(rng: np.random.RandomState, doc_id: str, page: int) -> List[dict]:
    pb = _PageBuilder(rng, doc_id, page)
    style = rng.randint(0, 4)

    # header / footer bands on most pages
    if rng.random_sample() < 0.7:
        pb.add("header", 100, 5, 700, 30)
    if rng.random_sample() < 0.7:
        pb.add("footer", 350, 1050, 450, 1075)

    if style == 0:  # single column
        y = pb.column(100, 700, 60, int(rng.randint(3, 8)))
        if rng.random_sample() < 0.5:
            y = pb.equation_block(180, min(y, 900))
    elif style == 1:  # two columns
        pb.column(60, 380, 60, int(rng.randint(3, 6)))
        pb.column(420, 740, 60, int(rng.randint(3, 6)))
    elif style == 2:  # figures and tables
        y = pb.figure_with_caption(120, 80)
        y = pb.table_block(120, y + 60)
        pb.column(450, 740, 80, int(rng.randint(2, 5)))
    else:  # math-heavy
        y = pb.text_with_embedded_eq(100, 60)
        y = pb.equation_block(150, y)
        y = pb.column(100, 520, y, int(rng.randint(2, 4)))

    # optional extra hazards
    if rng.random_sample() < 0.35:
        pb.near_duplicate()
    if rng.random_sample() < 0.15:
        pb.pinwheel(560, 840)
    if rng.random_sample() < 0.25:
        pb.cjk_snippet(100, 960)

    return pb.rows


def doc_rows(doc_id: str, mega: bool = False) -> List[dict]:
    """All span/sidecar rows of one document, offsets assigned doc-wide."""
    rng = np.random.RandomState(doc_seed(doc_id))
    # mega docs must actually cross pipeline.extract.MEGA_THRESHOLD
    # (5000 spans) so the page-salted skew path is exercised for real:
    # ~11 spans/page * 480-700 pages = ~5300-7700 spans.
    n_pages = int(rng.randint(480, 700)) if mega else int(rng.randint(1, 4))
    rows: List[dict] = []
    for page in range(n_pages):
        rows.extend(build_page(rng, doc_id, page))
    for off, row in enumerate(rows):
        row["offset"] = off
    return rows


def detector2_rows(rows: List[dict]) -> List[dict]:
    """Second-detector sidecar derived from the primary detections (U1,
    paper pipeline runs 2 detectors, paper_pipeline.py:21-33): the same
    spans re-detected with jittered bboxes, re-drawn confidences and
    label variants, with ~10% misses.  The jitter keeps >0.5 mutual
    overlap with the primary detection, so the J1 merge sweep dedups
    the cross-detector pairs (union -> merge, layout.py:67-68 + :112).
    Keys (doc_id, offset) are unchanged — both detectors join to the
    same spans."""
    out: List[dict] = []
    for r in rows:
        h = zlib.crc32(
            f"det2|{r['doc_id']}|{r['page']}|{r['offset']}".encode("utf-8")
        )
        if h % 10 == 0:
            continue  # detector 2 missed this region
        jx = float((h % 9) - 4)
        jy = float(((h >> 4) % 9) - 4)
        r2 = dict(r)
        r2["x1"] = r["x1"] + jx
        r2["x2"] = r["x2"] + jx
        r2["y1"] = r["y1"] + jy
        r2["y2"] = r["y2"] + jy
        r2["conf"] = round(
            min(0.99, max(0.05, r["conf"] + (((h >> 8) % 21) - 10) / 100.0)), 3
        )
        variants = LABELS_BY_KIND[r["kind"]]
        r2["label"] = variants[(h >> 2) % len(variants)]
        out.append(r2)
    return out


def corpus_rows(n_docs: int, mega_every: int = 97, prefix: str = "doc") -> List[dict]:
    rows: List[dict] = []
    for i in range(n_docs):
        doc_id = f"{prefix}-{i:08d}"
        rows.extend(
            doc_rows(doc_id, mega=(mega_every > 0 and i % mega_every == mega_every - 1))
        )
    return rows


def write_corpus_spark(
    spark, out_dir: str, n_docs: int, mega_every: int = 97, prefix: str = "doc"
) -> dict:
    """Parallel corpus generation: fan doc ids out over executors and
    write both tables as partitioned parquet.  Same bytes per doc as
    write_corpus (generation is seeded by doc_id alone)."""
    import pandas as pd

    from pyspark.sql import functions as F

    blocks_schema = (
        "doc_id string, offset int, page int, x1 double, y1 double, "
        "x2 double, y2 double, conf double, label string, "
        "kind string, text string, media_ref string, "
        "ocr_text string, lx1 double, ly1 double, lx2 double, ly2 double"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                doc_id = f"{prefix}-{int(i):08d}"
                mega = mega_every > 0 and int(i) % mega_every == mega_every - 1
                rows.extend(doc_rows(doc_id, mega=mega))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "offset", "page", "x1", "y1", "x2", "y2",
                    "conf", "label", "kind", "text", "media_ref",
                    "ocr_text", "lx1", "ly1", "lx2", "ly2",
                ],
            )

    ids = spark.range(n_docs).repartition(max(n_docs // 500, 8))
    flat = ids.mapInPandas(gen, schema=blocks_schema)
    flat.cache()
    flat.select(
        "doc_id", "offset", "page", "x1", "y1", "x2", "y2", "conf", "label",
        "ocr_text", "lx1", "ly1", "lx2", "ly2",
    ).write.mode("overwrite").parquet(f"{out_dir}/layout_blocks.parquet")
    (
        flat.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("tmp")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(tmp, s -> struct(s.kind as kind, s.text as text,"
                " s.media_ref as media_ref, cast(s.offset as int) as offset))"
            ).alias("spans"),
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )
    n_rows = flat.count()
    flat.unpersist()
    return {
        "documents": f"{out_dir}/documents.parquet",
        "layout_blocks": f"{out_dir}/layout_blocks.parquet",
        "n_rows": n_rows,
    }


# --- parquet writers (pyarrow; no Spark dependency) ----------------------


def write_corpus(out_dir: str, n_docs: int, mega_every: int = 97) -> dict:
    """Write documents.parquet + layout_blocks.parquet; returns paths."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rows = corpus_rows(n_docs, mega_every=mega_every)

    # nested documents table per input_hint
    docs: Dict[str, List[dict]] = {}
    for r in rows:
        docs.setdefault(r["doc_id"], []).append(
            {
                "kind": r["kind"],
                "text": r["text"],
                "media_ref": r["media_ref"],
                "offset": r["offset"],
            }
        )
    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    doc_ids = sorted(docs)
    documents = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array([docs[d] for d in doc_ids], pa.list_(span_type)),
        }
    )
    doc_path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(documents, doc_path)

    def _blocks_table(rws):
        return pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rws], pa.string()),
                "offset": pa.array([r["offset"] for r in rws], pa.int32()),
                "page": pa.array([r["page"] for r in rws], pa.int32()),
                "x1": pa.array([r["x1"] for r in rws], pa.float64()),
                "y1": pa.array([r["y1"] for r in rws], pa.float64()),
                "x2": pa.array([r["x2"] for r in rws], pa.float64()),
                "y2": pa.array([r["y2"] for r in rws], pa.float64()),
                "conf": pa.array([r["conf"] for r in rws], pa.float64()),
                "label": pa.array([r["label"] for r in rws], pa.string()),
                "ocr_text": pa.array([r["ocr_text"] for r in rws], pa.string()),
                "lx1": pa.array([r["lx1"] for r in rws], pa.float64()),
                "ly1": pa.array([r["ly1"] for r in rws], pa.float64()),
                "lx2": pa.array([r["lx2"] for r in rws], pa.float64()),
                "ly2": pa.array([r["ly2"] for r in rws], pa.float64()),
            }
        )

    blocks_path = os.path.join(out_dir, "layout_blocks.parquet")
    pq.write_table(_blocks_table(rows), blocks_path)
    # second-detector sidecar (U1 multi-detector flagship tests)
    blocks2_path = os.path.join(out_dir, "layout_blocks2.parquet")
    pq.write_table(_blocks_table(detector2_rows(rows)), blocks2_path)
    return {
        "documents": doc_path,
        "layout_blocks": blocks_path,
        "layout_blocks2": blocks2_path,
        "n_rows": len(rows),
    }
