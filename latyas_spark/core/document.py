"""Per-page extraction kernel: the full LATYAS operator DAG.

Reproduces the eight-stage physical plan of the reference's
``BasePipeline.analyze_pdf`` (latyas/pipelines/base_pipeline.py:94-192)
over span data, with every model call replaced by its deterministic
span-derived equivalent:

  detector ``detect``    -> sidecar rows (bbox, conf, raw label)
  OCR ``recognize(crop)``-> gather of native text-layer rects whose
                            intersection covers >0.5 of the smaller
                            side (the reference's own text-layer gather,
                            base_pipeline.py:17-42), newline-stripped
                            and joined with "" (:40-41)
  TexTeller equation OCR -> the equation span's own native text
  GOT-OCR2 table OCR     -> the table span's own native text
  TexMix mixed OCR       -> texmix.compose_text_with_equations

Stages (reference cites):
  1. confidence filter > 0.3 (ultralytics_layout_model.py:81)
  2. label -> kind, ordered substring match (block.py:29-68)
  3. overlap merge, strategy "merge" (layout.py:86-132 via :112)
  4. equation OCR (:114-125)
  5. embedded-equation containment, margin 20 (:127-152)
  6. table OCR (:154-167)
  7. text OCR for text-kind blocks without equations (:169-186)
  8. xy-cut reflow margin=10 horizontal-first (:189-190)
  9. emission filters (latyas/tools/pdf2text.py:30-39): skip blocks
     with no text, skip EmbedEq, ``$$``-wrap Equation; optional CJK
     cross-reference filters (pdf2txt.py:86-89)

Extension beyond the reference's text-only sink (north rule:
interleaved text + media): image-kind blocks are emitted as media spans
(text NULL, media_ref kept) instead of being dropped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import blocktypes as bt
from .overlap import overlap_merge
from .texmix import compose_text_with_equations
from .xycut import xy_cut_order


@dataclass(frozen=True)
class ExtractConfig:
    conf_threshold: float = 0.3  # ultralytics_layout_model.py:81
    area_threshold: float = 0.5  # layout.py:86
    merge_strategy: str = "merge"  # base_pipeline.py:112
    containment_margin: float = 20.0  # shape.py:121
    xy_margin: float = 10.0  # xy_cut_reflow.py:190
    max_depth: int = 8  # xy_cut_reflow.py:199
    gather_ratio: float = 0.5  # base_pipeline.py:34
    cjk_filters: bool = False  # pdf2txt.py:86-89 (report variant)
    keep_media: bool = True  # extension: emit media spans
    # Preset rule gate (paper/report/book pipelines bind different
    # kind->model tables; base_pipeline.py:115-186 looks a block's kind
    # up before every OCR stage).  None = every kind ruled (paper).
    # A kind with no rule makes the reference RAISE mid-page; at corpus
    # scale we leave the block textless instead (not emitted) — the
    # documented divergence shared with ocr_route's 'unrouted' counts.
    ruled_kinds: Optional[frozenset] = None
    # Dual-source (pdf2txt.py) parameters: detection bboxes live in
    # render coords (scale x2, y down from top-left); the PDF text
    # layer lives in PDF coords (y up from bottom-left).  C7 transform:
    # x' = x/render_scale, y' = page_height - y/render_scale
    # (pdf2txt.py:56,71).
    render_scale: float = 2.0  # pdf2txt.py:56
    page_height: float = 1100.0  # page.get_size() stand-in (pdf2txt.py:54)
    arbitrate_threshold: float = 0.2  # pdf2txt.py:83


DEFAULT_CONFIG = ExtractConfig()


def _kind_ruled(cfg: ExtractConfig, kind_code: int) -> bool:
    return cfg.ruled_kinds is None or kind_code in cfg.ruled_kinds

Span = Tuple[str, Optional[str], Optional[str]]  # (kind, text, media_ref)


def gather_text(
    rect: Tuple[float, float, float, float],
    layer_rects: np.ndarray,
    layer_areas: np.ndarray,
    layer_texts: Sequence[str],
    ratio: float,
) -> str:
    """Text-layer gather: the deterministic OCR stand-in.

    Concatenates (separator "") the newline-stripped texts of every
    text-layer rect whose intersection with ``rect`` exceeds ``ratio``
    of the smaller area, in text-layer (offset) order — exactly the
    reference's get_text_by_bbox (base_pipeline.py:17-42).
    """
    if len(layer_texts) == 0:
        return ""
    x1, y1, x2, y2 = rect
    if x1 >= x2:  # Rectangle constructor clamp (shape.py:74-77)
        x2 = x1
    if y1 >= y2:
        y2 = y1
    rect_area = (x2 - x1) * (y2 - y1)
    iw = np.minimum(layer_rects[:, 2], x2) - np.maximum(layer_rects[:, 0], x1)
    ih = np.minimum(layer_rects[:, 3], y2) - np.maximum(layer_rects[:, 1], y1)
    inter = np.where(iw > 0, iw, 0.0) * np.where(ih > 0, ih, 0.0)
    denom = np.minimum(layer_areas, rect_area)
    # zero-area guard without errstate (reference would divide by zero)
    hits = np.nonzero(inter > ratio * denom)[0]
    if len(hits) and not (denom[hits] > 0).all():
        hits = hits[denom[hits] > 0]
    return "".join(layer_texts[i].replace("\n", "") for i in hits)


def gather_text_batch(
    qx1: np.ndarray,
    qy1: np.ndarray,
    qx2: np.ndarray,
    qy2: np.ndarray,
    layer_rects: np.ndarray,
    layer_areas: np.ndarray,
    layer_texts: Sequence[str],
    ratio: float,
) -> List[str]:
    """Vectorized ``gather_text`` for B query rects at once: one
    (B x L) intersection matrix instead of B separate numpy dispatch
    chains.  Bit-identical to calling gather_text per rect (same clamp,
    zero-area guard, layer-order join)."""
    B = len(qx1)
    if B == 0:
        return []
    if len(layer_texts) == 0:
        return [""] * B
    qx1 = np.asarray(qx1, dtype=np.float64)
    qy1 = np.asarray(qy1, dtype=np.float64)
    qx2 = np.where(qx1 >= qx2, qx1, qx2)  # shape.py:74-77 clamp
    qy2 = np.where(qy1 >= qy2, qy1, qy2)
    rect_area = (qx2 - qx1) * (qy2 - qy1)
    iw = np.minimum(layer_rects[None, :, 2], qx2[:, None]) - np.maximum(
        layer_rects[None, :, 0], qx1[:, None]
    )
    ih = np.minimum(layer_rects[None, :, 3], qy2[:, None]) - np.maximum(
        layer_rects[None, :, 1], qy1[:, None]
    )
    inter = np.where(iw > 0, iw, 0.0) * np.where(ih > 0, ih, 0.0)
    denom = np.minimum(layer_areas[None, :], rect_area[:, None])
    hits = (inter > ratio * denom) & (denom > 0)
    out = []
    for b in range(B):
        idx = np.nonzero(hits[b])[0]
        out.append("".join(layer_texts[i].replace("\n", "") for i in idx))
    return out


def extract_page(
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    conf: np.ndarray,
    labels: Sequence[str],
    texts: Sequence[Optional[str]],
    media_refs: Sequence[Optional[str]],
    cfg: ExtractConfig = DEFAULT_CONFIG,
    det: Optional[np.ndarray] = None,
    offsets: Optional[np.ndarray] = None,
) -> List[Span]:
    """Run the full page DAG; rows must be in span-offset order.

    Each input row is both a detection candidate (bbox, conf, label)
    and a text-layer rect (bbox, native text).  Returns the emitted
    spans in reading order.

    ``det`` (multi-detector U1, layout.py:67-68): detector index per
    row.  Rows must arrive detector-major ((det, offset) order — the
    reference's Layout.merge appends detector 2's blocks after
    detector 1's, base_pipeline.py:104-111), and the PDF text layer is
    built from detector 0's rows only: the text layer is a property of
    the page, not of a detector, so a second detector's jittered
    re-detections must not duplicate gathered text.

    ``offsets``: doc-wide span offset per row; used as the identity key
    for the texmix equation-line exclusion (mix mask analog).  Without
    it the row index is the key — identical semantics single-detector,
    but multi-detector rows sharing an offset must exclude by offset.
    """
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    conf = np.asarray(conf, dtype=np.float64)
    n = len(x1)

    # text layer: every row with native text, regardless of confidence
    layer_idx = [
        i for i in range(n)
        if texts[i] is not None and (det is None or det[i] == 0)
    ]
    layer_rects = np.stack(
        [x1[layer_idx], y1[layer_idx], x2[layer_idx], y2[layer_idx]], axis=1
    ) if layer_idx else np.empty((0, 4))
    layer_areas = (
        (layer_rects[:, 2] - layer_rects[:, 0]) * (layer_rects[:, 3] - layer_rects[:, 1])
        if layer_idx
        else np.empty(0)
    )
    layer_texts = [texts[i] for i in layer_idx]

    def recognize(rect: Tuple[float, float, float, float]) -> str:
        return gather_text(rect, layer_rects, layer_areas, layer_texts, cfg.gather_ratio)

    # stage 1-2: confidence filter + label classification
    det = np.nonzero(conf > cfg.conf_threshold)[0]
    kinds = bt.kinds_from_labels([labels[i] for i in det])

    # stage 3: overlap merge
    keep, bx1, by1, bx2, by2, bkinds = overlap_merge(
        x1[det], y1[det], x2[det], y2[det],
        kinds, bt.TEXT_KIND_LOOKUP,
        area_threshold=cfg.area_threshold,
        strategy=cfg.merge_strategy,
    )
    src = det[keep]  # surviving block -> original row (payload carrier)
    m = len(src)
    block_text: List[Optional[str]] = [None] * m
    has_eq = np.zeros(m, dtype=bool)

    # stage 4: equation OCR (own span text); rule-gated per preset
    # (base_pipeline.py:120-125 — reference raises without a rule)
    if _kind_ruled(cfg, bt.EQUATION):
        for b in range(m):
            if bkinds[b] == bt.EQUATION:
                block_text[b] = texts[src[b]]

    # stage 5: embedded-equation containment -> texmix compose
    text_mask = bt.text_kind_mask(bkinds)
    eq_member_offsets = set()
    eq_blocks = [b for b in range(m) if bkinds[b] == bt.EMBED_EQ]
    contained: List[List[int]] = [[] for _ in range(m)]
    for b in range(m):
        if not text_mask[b]:
            continue
        for e in eq_blocks:
            if e == b:
                continue
            if (
                bx1[e] >= bx1[b] - cfg.containment_margin
                and by1[e] >= by1[b] - cfg.containment_margin
                and bx2[e] <= bx2[b] + cfg.containment_margin
                and by2[e] <= by2[b] + cfg.containment_margin
            ):
                contained[b].append(e)
    for b in range(m):
        if not contained[b]:
            continue
        has_eq[b] = True
        # rule gate: TextWithEquation route (base_pipeline.py:146-151);
        # _has_equation is still set first, exactly as the reference
        # does before its rule lookup, so stage 7 skips the block
        if not _kind_ruled(cfg, bt.TEXT_WITH_EQUATION):
            continue
        eqs = contained[b]
        eq_rects = [(bx1[e], by1[e], bx2[e], by2[e]) for e in eqs]
        eq_texts = [texts[src[e]] or "" for e in eqs]
        if offsets is None:
            eq_rows = {int(src[e]) for e in eqs}
        else:
            eq_rows = {int(offsets[src[e]]) for e in eqs}
        # mask analog: text lines overlapping the block, equations excluded
        block_rect = (bx1[b], by1[b], bx2[b], by2[b])
        line_rects = []
        if len(layer_texts):
            iw = np.minimum(layer_rects[:, 2], block_rect[2]) - np.maximum(
                layer_rects[:, 0], block_rect[0]
            )
            ih = np.minimum(layer_rects[:, 3], block_rect[3]) - np.maximum(
                layer_rects[:, 1], block_rect[1]
            )
            inter = np.where(iw > 0, iw, 0.0) * np.where(ih > 0, ih, 0.0)
            block_area = (block_rect[2] - block_rect[0]) * (block_rect[3] - block_rect[1])
            denom = np.minimum(layer_areas, block_area)
            # inter <= denom, so inter > ratio*denom implies denom > 0
            for k in np.nonzero(inter > cfg.gather_ratio * denom)[0]:
                key = (
                    layer_idx[k] if offsets is None
                    else int(offsets[layer_idx[k]])
                )
                if key in eq_rows:
                    continue
                line_rects.append(tuple(layer_rects[k]))
        block_text[b] = compose_text_with_equations(
            eq_rects, eq_texts, line_rects, recognize
        )

    # stage 6: table OCR (own span text); rule-gated per preset
    if _kind_ruled(cfg, bt.TABLE):
        for b in range(m):
            if bkinds[b] == bt.TABLE:
                block_text[b] = texts[src[b]]

    # stage 7: text OCR via gather — all plain text blocks of the page
    # in one vectorized intersection matrix; rule gate is PER KIND
    # (base_pipeline.py:180-184 looks up block.kind: report/book rule
    # only title/text/caption, so header/footer/reference stay textless)
    plain = [
        b for b in range(m)
        if text_mask[b] and not has_eq[b] and _kind_ruled(cfg, int(bkinds[b]))
    ]
    gathered = gather_text_batch(
        bx1[plain], by1[plain], bx2[plain], by2[plain],
        layer_rects, layer_areas, layer_texts, cfg.gather_ratio,
    )
    for b, text in zip(plain, gathered):
        if cfg.cjk_filters:
            # pdf2txt.py:86-89: drop CJK cross-reference snippets
            if text.startswith("图") or text.startswith("表"):
                continue
            if len(text) < 256 and ("见表" in text or "见图" in text):
                continue
        block_text[b] = text

    # stage 8: xy-cut reflow
    order = xy_cut_order(
        bx1, by1, bx2, by2, margin=cfg.xy_margin, horizontal_first=True,
        max_depth=cfg.max_depth,
    )

    # stage 9: emission
    out: List[Span] = []
    for b in order:
        kind = int(bkinds[b])
        name = bt.KIND_NAMES[kind]
        if kind in bt.IMAGE_KINDS:
            if cfg.keep_media:
                out.append((name, None, media_refs[src[b]]))
            continue
        text = block_text[b]
        if text is None:
            continue
        if kind == bt.EMBED_EQ:
            continue
        if kind == bt.EQUATION:
            out.append((name, "\n$$\n" + text + "\n$$\n", None))
        else:
            out.append((name, text, None))
    return out


# Kinds the dual-source path arbitrates (pdf2txt.py:68: Text, Title,
# Caption — every other block keeps no text and is not emitted).
ARBITRATE_KINDS = frozenset({bt.TEXT, bt.TITLE, bt.CAPTION})


def extract_page_dual(
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    conf: np.ndarray,
    labels: Sequence[str],
    ocr_texts: Sequence[Optional[str]],
    lx1: np.ndarray,
    ly1: np.ndarray,
    lx2: np.ndarray,
    ly2: np.ndarray,
    texts: Sequence[Optional[str]],
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> List[Span]:
    """Dual-source (E2) page pipeline: the reference's ``pdf2txt.py``
    arbitration variant (get_page_text, pdf2txt.py:52-100).

    Each row carries a detection bbox in RENDER coords (x1..y2; the
    rendered page image, scale ``cfg.render_scale``, y down) plus its
    native text-layer rect in PDF coords (lx1..ly2; y up from the
    bottom-left) and text.  ``ocr_texts`` is the OCR-model output for
    the row's region (the pluggable model call of the reference).

    Stages (reference cites):
      1. confidence filter + classify + overlap merge — inside
         model.detect (ultralytics_layout_model.py:81-87)
      2. for Text/Title/Caption blocks only (pdf2txt.py:68):
         C7 coordinate flip+descale of the detection bbox
         (pdf2txt.py:71), PDF-text gather over the text layer
         (get_text_by_bbox, pdf2txt.py:29-49), levenshtein arbitration
         ``dis/max(len) < 0.2 -> pdf text else ocr text``
         (pdf2txt.py:81-88), unconditional CJK cross-ref filters
         (pdf2txt.py:89-92)
      3. xy-cut reflow over all blocks (pdf2txt.py:93-94)
      4. emit blocks with text, in reading order (pdf2txt.py:100)
    """
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    conf = np.asarray(conf, dtype=np.float64)
    n = len(x1)

    # PDF text layer (textpage rects): rows with native text
    layer_idx = [i for i in range(n) if texts[i] is not None]
    if layer_idx:
        layer_rects = np.stack(
            [
                np.asarray(lx1, dtype=np.float64)[layer_idx],
                np.asarray(ly1, dtype=np.float64)[layer_idx],
                np.asarray(lx2, dtype=np.float64)[layer_idx],
                np.asarray(ly2, dtype=np.float64)[layer_idx],
            ],
            axis=1,
        )
        # Rectangle constructor clamp (shape.py:74-77)
        layer_rects[:, 2] = np.maximum(layer_rects[:, 2], layer_rects[:, 0])
        layer_rects[:, 3] = np.maximum(layer_rects[:, 3], layer_rects[:, 1])
        layer_areas = (layer_rects[:, 2] - layer_rects[:, 0]) * (
            layer_rects[:, 3] - layer_rects[:, 1]
        )
    else:
        layer_rects = np.empty((0, 4))
        layer_areas = np.empty(0)
    layer_texts = [texts[i] for i in layer_idx]

    # stage 1: detect = conf filter + classify + overlap merge
    det = np.nonzero(conf > cfg.conf_threshold)[0]
    kinds = bt.kinds_from_labels([labels[i] for i in det])
    keep, bx1, by1, bx2, by2, bkinds = overlap_merge(
        x1[det], y1[det], x2[det], y2[det],
        kinds, bt.TEXT_KIND_LOOKUP,
        area_threshold=cfg.area_threshold,
        strategy=cfg.merge_strategy,
    )
    src = det[keep]
    m = len(src)
    block_text: List[Optional[str]] = [None] * m

    # stage 2: per-block arbitration
    from .textdist import relative_distance

    rs = cfg.render_scale
    H = cfg.page_height
    arb = [b for b in range(m) if bkinds[b] in ARBITRATE_KINDS]
    # C7: render coords -> PDF coords (pdf2txt.py:71: x/rs, H - y/rs
    # with y1/y2 swapping roles under the flip)
    pdf_texts = gather_text_batch(
        bx1[arb] / rs,
        H - by2[arb] / rs,
        bx2[arb] / rs,
        H - by1[arb] / rs,
        layer_rects, layer_areas, layer_texts, cfg.gather_ratio,
    )
    for b, pdf_text in zip(arb, pdf_texts):
        ocr = ocr_texts[src[b]] or ""
        if relative_distance(ocr, pdf_text) < cfg.arbitrate_threshold:
            text = pdf_text
        else:
            text = ocr
        # CJK cross-ref filters, unconditional here (pdf2txt.py:89-92)
        if text.startswith("图") or text.startswith("表"):
            continue
        if len(text) < 256 and ("见表" in text or "见图" in text):
            continue
        block_text[b] = text

    # stage 3: xy-cut reflow (render coords, defaults: pdf2txt.py:93)
    order = xy_cut_order(
        bx1, by1, bx2, by2, margin=cfg.xy_margin, horizontal_first=True,
        max_depth=cfg.max_depth,
    )

    # stage 4: emission — text blocks only (pdf2txt.py:100)
    out: List[Span] = []
    for b in order:
        text = block_text[b]
        if text is None:
            continue
        out.append((bt.KIND_NAMES[int(bkinds[b])], text, None))
    return out


def extract_page_rows(rows: Sequence[dict], cfg: ExtractConfig = DEFAULT_CONFIG) -> List[Span]:
    """Convenience wrapper over dict rows (offset order expected)."""
    return extract_page(
        np.array([r["x1"] for r in rows]),
        np.array([r["y1"] for r in rows]),
        np.array([r["x2"] for r in rows]),
        np.array([r["y2"] for r in rows]),
        np.array([r["conf"] for r in rows]),
        [r["label"] for r in rows],
        [r["text"] for r in rows],
        [r["media_ref"] for r in rows],
        cfg,
    )


def extract_document_rows(
    rows: Sequence[dict], cfg: ExtractConfig = DEFAULT_CONFIG
) -> List[Tuple[str, Optional[str], Optional[str], int]]:
    """Run every page of a doc, assigning a doc-wide reading order."""
    pages = sorted({r["page"] for r in rows})
    out: List[Tuple[str, Optional[str], Optional[str], int]] = []
    pos = 0
    for p in pages:
        page_rows = sorted((r for r in rows if r["page"] == p), key=lambda r: r["offset"])
        for kind, text, media in extract_page_rows(page_rows, cfg):
            out.append((kind, text, media, pos))
            pos += 1
    return out
