"""Per-block interleaved text+equation composition.

Deterministic re-expression of the reference's TexMix recognize flow
(latyas/tex_ocr/models/texmix/texmix_model.py:70-151) over span data:
where the reference detects embedded equations inside a text block's
crop, masks them, detects text lines, splits the lines around the
equations and re-recognizes the fragments, our engine receives the
contained equation spans and the native text-layer rects directly and
substitutes every model ``recognize`` call with a deterministic gather
over native spans (see document.py).

Stage mapping (reference line cites):

1. equation snippets ``"$" + text + "$"`` in detection order (:89-92);
2. equations sorted by x1, stable (:95-98);
3. text boxes reflowed with xy-cut margin=0, vertical-first (:103-105);
4. each text box split via ``split_x`` around every equation whose
   intersection covers >0.8 of the equation's area (:107-123, split_x
   semantics shape.py:151-159);
5. content-less fragments recognized (gather closure) (:126-131);
6. all snippets shrunk by 0.5 and reflowed margin=0 vertical-first;
   the permutation is applied to the *unshrunk* snippets (:139-146);
7. contents joined with a single space (:148-151).

Deviation (documented): if an equation extends to the right edge of the
current fragment, the reference's loop would dereference ``None`` on the
next equation (:117-121); we stop splitting that box instead.  Fixtures
avoid the degenerate case, so goldens are unaffected.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .xycut import xy_cut_order

Rect = Tuple[float, float, float, float]


def _split_x(rect: Rect, x: float) -> Tuple[Optional[Rect], Optional[Rect]]:
    """shape.py:151-159 semantics (boundary goes entirely one side)."""
    x1, y1, x2, y2 = rect
    if x <= x1:
        return None, rect
    if x >= x2:
        return rect, None
    return (x1, y1, x, y2), (x, y1, x2, y2)


def _reflow(rects: Sequence[Rect]) -> List[int]:
    """xy-cut margin=0, vertical-first over a snippet list."""
    if not rects:
        return []
    arr = np.asarray(rects, dtype=np.float64)
    order = xy_cut_order(
        arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], margin=0.0, horizontal_first=False
    )
    return order.tolist()


def _shrink(rect: Rect, factor: float) -> Rect:
    x1, y1, x2, y2 = rect
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    hw, hh = (x2 - x1) * factor / 2.0, (y2 - y1) * factor / 2.0
    return (cx - hw, cy - hh, cx + hw, cy + hh)


def compose_text_with_equations(
    eq_rects: Sequence[Rect],
    eq_texts: Sequence[str],
    line_rects: Sequence[Rect],
    recognize: Callable[[Rect], str],
) -> str:
    """Compose the text of a has-equation block.

    ``eq_rects``/``eq_texts``: contained equation spans in layout order
    (the detection-order stand-in).  ``line_rects``: native text-layer
    rects overlapping the block, equations excluded (the mask analog).
    ``recognize(rect)``: deterministic text gather for a rect.
    """
    snippets: List[Tuple[Rect, Optional[str]]] = []

    # 1. equation snippets, inline-wrapped, in detection order
    for rect, text in zip(eq_rects, eq_texts):
        snippets.append((rect, "$" + text + "$"))

    # 2. equations sorted by x1 (stable)
    eq_order = sorted(range(len(eq_rects)), key=lambda i: eq_rects[i][0])
    eqs_by_x = [eq_rects[i] for i in eq_order]

    # 3. reflow text boxes (margin=0, vertical-first)
    line_order = _reflow(line_rects)
    lines = [line_rects[i] for i in line_order]

    # 4. split each text box around >0.8-covered equations
    fragments: List[Rect] = []
    for box in lines:
        bx1, by1, bx2, by2 = box
        cur: Optional[Rect] = box
        for ex1, ey1, ex2, ey2 in eqs_by_x:
            iw = min(bx2, ex2) - max(bx1, ex1)
            ih = min(by2, ey2) - max(by1, ey1)
            inter = max(iw, 0.0) * max(ih, 0.0)
            eq_area = (ex2 - ex1) * (ey2 - ey1)
            if eq_area <= 0 or inter / eq_area <= 0.8:
                continue
            if cur is None:
                break  # documented deviation (reference would crash)
            lhs, _ = _split_x(cur, ex1)
            _, rhs = _split_x(cur, ex2)
            if lhs is not None:
                fragments.append(lhs)
            cur = rhs
        if cur is not None:
            fragments.append(cur)

    # 5. recognize fragments
    for frag in fragments:
        snippets.append((frag, recognize(frag)))

    # 6. shrink + reflow, permute the unshrunk snippets
    shrunk = [_shrink(rect, 0.5) for rect, _ in snippets]
    final_order = _reflow(shrunk)

    # 7. join with single spaces
    return " ".join(snippets[i][1] or "" for i in final_order)
