"""Table-structure assembly: detected row/column/header/spanning boxes
-> consistent cell grid -> CSV / HTML export.

Re-derivation of the deterministic post-processing half of the
reference's TATR table-structure pipeline (M11) — the part that is
pure geometry over detected bounding boxes and needs no model:

* ``iob`` intersection-over-box-area       (tatr/pipeline.py:83-94)
* row/col ordering top-to-bottom /
  left-to-right by center                  (tatr/postprocess.py:358-370)
* header flag per row: iob(row, header)
  >= 0.5                                   (tatr/pipeline.py:368-372)
* cell grid = row x column intersections   (tatr/pipeline.py:376-399 of
                                            structure_to_cells)
* subcell test: spanning-cell overlap
  / cell area > 0.5                        (tatr/pipeline.py:404-417)
* spanning-cell merge: union of subcells
  with overlap/subcell_area > 0.5; header
  = AND over subcells                      (tatr/pipeline.py:419-451)
* cell bbox re-dilation: intersect(union
  of its rows, union of its columns)       (tatr/pipeline.py:440-455)
* token slotting: max-overlap unique
  assignment, threshold 0.001              (tatr/pipeline.py:457-458;
                                            postprocess.py:208-249)
* cell text: space-join in token order     (postprocess.py:307-355,
                                            remove_integer_superscripts
                                            =False per pipeline.py:462)
* cells_to_csv header flattening with
  ' | ' de-dup join                        (tatr/pipeline.py:516-542)
* cells_to_html thead-per-header-row,
  colspan/rowspan attrs                    (tatr/pipeline.py:544-573)

The upstream detection model (RT-DETR weights) is a plug point like
every M-row model: this module consumes already-detected object boxes.
Everything here is per-table small data (tens of boxes), so the Spark
entry points run it inside ``applyInPandas`` grouped by ``table_id`` —
at corpus scale the key is (doc_id, page, table_idx): billions of tiny
groups, no skew, one shuffle.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

Box = Tuple[float, float, float, float]


def _intersect(a: Box, b: Box) -> Box:
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    if x2 < x1 or y2 < y1:
        return (0.0, 0.0, 0.0, 0.0)
    return (x1, y1, x2, y2)


def _area(b: Box) -> float:
    return max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)


def _union(a: Optional[Box], b: Box) -> Box:
    if a is None:
        return b
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def iob(bbox1: Box, bbox2: Box) -> float:
    """Intersection area over bbox1's own area (tatr/pipeline.py:83-94)."""
    a1 = _area(bbox1)
    if a1 <= 0:
        return 0.0
    return _area(_intersect(bbox1, bbox2)) / a1


def sort_left_to_right(boxes: Sequence[Box]) -> List[int]:
    """Order columns by x-center = x1+x2 (postprocess.py:358-363)."""
    return sorted(range(len(boxes)), key=lambda i: boxes[i][0] + boxes[i][2])


def sort_top_to_bottom(boxes: Sequence[Box]) -> List[int]:
    """Order rows by y-center = y1+y2 (postprocess.py:365-370)."""
    return sorted(range(len(boxes)), key=lambda i: boxes[i][1] + boxes[i][3])


def assemble_cells(
    rows: Sequence[Box],
    columns: Sequence[Box],
    header_boxes: Sequence[Box] = (),
    spanning: Sequence[Box] = (),
    tokens: Sequence[Tuple[Box, str, int]] = (),
) -> List[Dict]:
    """Detected structure boxes -> consistent cell list.

    ``tokens`` are (bbox, text, token_num) triples; token_num plays the
    role of the reference's (block_num, line_num, span_num) composite
    sort key (postprocess.py:327-329) collapsed to one ordinal.

    Returns cells as dicts with keys ``row_nums`` (sorted list),
    ``col_nums`` (sorted list), ``header`` (bool), ``text`` (str),
    ``bbox``.
    """
    if not rows or not columns:
        return []

    row_order = sort_top_to_bottom(rows)
    col_order = sort_left_to_right(columns)
    rows = [rows[i] for i in row_order]
    columns = [columns[i] for i in col_order]

    # header flag per row (pipeline.py:368-372)
    row_is_header = [
        any(iob(r, h) >= 0.5 for h in header_boxes) for r in rows
    ]

    # grid + subcell split (pipeline.py:376-417)
    cells: List[Dict] = []
    subcells: List[Dict] = []
    for c, col in enumerate(columns):
        for r, row in enumerate(rows):
            cbox = _intersect(row, col)
            cell = {
                "bbox": cbox,
                "row_nums": [r],
                "col_nums": [c],
                "header": row_is_header[r],
            }
            carea = _area(cbox)
            is_sub = False
            if carea > 0:
                for sp in spanning:
                    if _area(_intersect(sp, cbox)) / carea > 0.5:
                        is_sub = True
                        break
            (subcells if is_sub else cells).append(cell)

    # merge subcells per spanning cell (pipeline.py:419-451)
    for sp in spanning:
        merged_rows: set = set()
        merged_cols: set = set()
        bbox: Optional[Box] = None
        header = True
        for sub in subcells:
            sarea = _area(sub["bbox"])
            if sarea <= 0:
                continue
            if _area(_intersect(sub["bbox"], sp)) / sarea > 0.5:
                bbox = _union(bbox, sub["bbox"])
                merged_rows.update(sub["row_nums"])
                merged_cols.update(sub["col_nums"])
                header = header and sub["header"]
        if merged_rows and merged_cols:
            cells.append(
                {
                    "bbox": bbox,
                    "row_nums": sorted(merged_rows),
                    "col_nums": sorted(merged_cols),
                    "header": header,
                }
            )

    # re-dilate each cell to intersect(union(rows), union(cols))
    # (pipeline.py:440-455)
    for cell in cells:
        rbox: Optional[Box] = None
        for r in cell["row_nums"]:
            rbox = _union(rbox, rows[r])
        cbox: Optional[Box] = None
        for c in cell["col_nums"]:
            cbox = _union(cbox, columns[c])
        dil = _intersect(rbox, cbox)
        if _area(dil) > 0:
            cell["bbox"] = dil

    # token slotting: unique max-overlap assignment, threshold 0.001
    # (pipeline.py:457-458; postprocess.py:208-249).  Ties go to the
    # first container in cell order, like sorted()'s stable order on
    # equal scores in sort_objects_by_score (postprocess.py:251-259).
    assigned: List[List[Tuple[int, str]]] = [[] for _ in cells]
    for tb, ttext, tnum in tokens:
        tarea = _area(tb)
        if tarea <= 0:
            continue
        best_i, best_score = -1, -1.0
        for i, cell in enumerate(cells):
            score = _area(_intersect(cell["bbox"], tb)) / tarea
            if score > best_score:
                best_i, best_score = i, score
        if best_i >= 0 and best_score >= 0.001:
            assigned[best_i].append((tnum, ttext))

    for cell, toks in zip(cells, assigned):
        toks.sort(key=lambda t: t[0])
        cell["text"] = " ".join(t[1] for t in toks).strip()

    return cells


def _csv_field(text: str) -> str:
    """Minimal CSV quoting (csv.QUOTE_MINIMAL, what pandas.to_csv used
    by the reference emits, pipeline.py:542)."""
    if any(ch in text for ch in (",", '"', "\n", "\r")):
        return '"' + text.replace('"', '""') + '"'
    return text


def cells_to_csv(cells: List[Dict]) -> Optional[str]:
    """Cell list -> CSV string (tatr/pipeline.py:516-542).

    Header rows are flattened per column by joining the de-duplicated
    header texts with ' | ' (OrderedDict.fromkeys semantics,
    pipeline.py:537-539); body rows follow, one line each, trailing
    newline like DataFrame.to_csv.
    """
    if not cells:
        return None
    n_cols = max(max(c["col_nums"]) for c in cells) + 1
    n_rows = max(max(c["row_nums"]) for c in cells) + 1

    header_cells = [c for c in cells if c["header"]]
    max_header_row = (
        max(max(c["row_nums"]) for c in header_cells) if header_cells else -1
    )

    grid: List[List[Optional[str]]] = [
        [None] * n_cols for _ in range(n_rows)
    ]
    for cell in cells:
        for r in cell["row_nums"]:
            for c in cell["col_nums"]:
                grid[r][c] = cell.get("text", "")

    header_names = []
    for c in range(n_cols):
        seen: Dict[str, None] = {}
        for r in range(max_header_row + 1):
            v = grid[r][c]
            if v is not None:
                seen.setdefault(v, None)
        header_names.append(" | ".join(seen.keys()))

    lines = [",".join(_csv_field(h) for h in header_names)]
    for r in range(max_header_row + 1, n_rows):
        lines.append(
            ",".join(_csv_field(v if v is not None else "") for v in grid[r])
        )
    return "\n".join(lines) + "\n"


def _xml_escape(text: str) -> str:
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def cells_to_html(cells: List[Dict]) -> str:
    """Cell list -> HTML string (tatr/pipeline.py:544-573), matching
    ElementTree serialization: cells sorted by (min row, min col), a
    new container opens whenever min-row increases — ``<thead>`` for
    header cells, ``<tr>`` otherwise (the reference's one-thead-per-
    header-row quirk is preserved) — colspan before rowspan, and
    short_empty_elements=False (empty cells render ``<td></td>``)."""
    cells = sorted(cells, key=lambda c: min(c["col_nums"]))
    cells = sorted(cells, key=lambda c: min(c["row_nums"]))

    parts = ["<table>"]
    current_row = -1
    open_tag = None
    cell_tag = "td"
    for cell in cells:
        this_row = min(cell["row_nums"])
        if this_row > current_row:
            current_row = this_row
            if open_tag is not None:
                parts.append(f"</{open_tag}>")
            # th/td is decided once per row, by the row-opening cell
            # (pipeline.py:556-563) — NOT re-decided per cell
            open_tag = "thead" if cell["header"] else "tr"
            cell_tag = "th" if cell["header"] else "td"
            parts.append(f"<{open_tag}>")
        attrs = ""
        colspan = len(cell["col_nums"])
        if colspan > 1:
            attrs += f' colspan="{colspan}"'
        rowspan = len(cell["row_nums"])
        if rowspan > 1:
            attrs += f' rowspan="{rowspan}"'
        parts.append(
            f"<{cell_tag}{attrs}>{_xml_escape(cell.get('text', ''))}"
            f"</{cell_tag}>"
        )
    if open_tag is not None:
        parts.append(f"</{open_tag}>")
    parts.append("</table>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# pandas-frame adapter used by the Spark applyInPandas entry point
# ---------------------------------------------------------------------------

OBJ_ROW, OBJ_COL, OBJ_HEADER, OBJ_SPAN, OBJ_TOKEN = (
    "row",
    "column",
    "header",
    "spanning",
    "token",
)


def assemble_from_frame(pdf) -> List[Dict]:
    """One table's object rows (columns: obj_type, x1, y1, x2, y2,
    text, token_num) -> cell list via :func:`assemble_cells`."""
    boxes = {OBJ_ROW: [], OBJ_COL: [], OBJ_HEADER: [], OBJ_SPAN: []}
    tokens: List[Tuple[Box, str, int]] = []
    for obj_type, x1, y1, x2, y2, text, tnum in zip(
        pdf["obj_type"], pdf["x1"], pdf["y1"], pdf["x2"], pdf["y2"],
        pdf["text"], pdf["token_num"],
    ):
        box = (float(x1), float(y1), float(x2), float(y2))
        if obj_type == OBJ_TOKEN:
            tokens.append((box, "" if text is None else str(text), int(tnum)))
        else:
            boxes[obj_type].append(box)
    return assemble_cells(
        rows=boxes[OBJ_ROW],
        columns=boxes[OBJ_COL],
        header_boxes=boxes[OBJ_HEADER],
        spanning=boxes[OBJ_SPAN],
        tokens=tokens,
    )
