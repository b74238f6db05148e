"""XY-cut reading-order recovery — iterative NumPy kernel.

Semantics of the reference's recursive implementation
(latyas/layout/reflow/position_based/xy_cut_reflow.py:14-203), re-built
as an explicit-stack loop over index arrays so it can run over Arrow
batches inside ``applyInPandas`` without Python recursion:

* candidate cut positions are the sorted multiset {lo - margin,
  hi + margin} over *all* boxes of the current region, consumed in value
  order including duplicates (xy_cut_reflow.py:77-85);
* a cut is applied only when nothing straddles it; a box with
  ``lo <= cut`` and ``hi <= cut`` goes to the near side even when it
  also touches the far side (first-branch-wins, :53-58);
* margin decays as ``margin - depth * (margin / max_depth)`` computed
  from the *current* margin each level (:96, :169);
* axes alternate (horizontal cuts first by default); recursion deeper
  than ``max_depth`` falls back to the quantized grid sort
  (:14-37); entry uses margin=10, max_depth=8 (:189-202).

Grid-sort quirks preserved (goldens depend on them):

* the extent fold is seeded from block 0 of the *whole layout*, not of
  the subset (:19);
* coordinates are truncated to int before quantization (:33);
* scale factors are floor divisions ``(h // 16, w // 3)`` (:29).

One documented deviation: when a quantization divisor floors to 0 the
reference raises ZeroDivisionError; we substitute 1 (fixtures avoid the
degenerate case, so goldens are unaffected).

The order produced for tied quantized keys follows input order (stable
sort), mirroring Python's ``sorted`` stability (:35).
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right

import numpy as np

HORIZONTAL = 0  # cut along x (vertical split lines)
VERTICAL = 1  # cut along y


def grid_sort_indices(
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    idx: np.ndarray,
    div_y: int = 16,
    div_x: int = 3,
) -> np.ndarray:
    """Quantized lexicographic sort of the subset ``idx``.

    Mirrors simple_position_reflow (xy_cut_reflow.py:14-37) including
    the block-0 extent seed; ``div_y=256`` reproduces position_reflow
    (position_reflow.py:8-21).
    """
    if len(idx) == 0:
        return idx
    # extent seeded from the whole layout's first block (quirk, :19)
    min_x = min(float(x1[0]), float(x1[idx].min()))
    max_x = max(float(x2[0]), float(x2[idx].max()))
    min_y = min(float(y1[0]), float(y1[idx].min()))
    max_y = max(float(y2[0]), float(y2[idx].max()))
    sf_y = (max_y - min_y) // div_y
    sf_x = (max_x - min_x) // div_x
    if sf_y == 0:
        sf_y = 1.0  # deviation: reference would ZeroDivisionError
    if sf_x == 0:
        sf_x = 1.0

    ix1 = x1[idx].astype(np.int64)
    iy1 = y1[idx].astype(np.int64)
    ix2 = x2[idx].astype(np.int64)
    iy2 = y2[idx].astype(np.int64)
    qx, qy = ix1 // sf_x, iy1 // sf_y
    qx2, qy2 = ix2 // sf_x, iy2 // sf_y
    # lexsort: last key is primary; stable, so ties keep subset order
    perm = np.lexsort((qy2, qx2, qy, qx))
    return idx[perm]


def position_reflow_order(
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    page_h: float,
    page_w: float,
    h_chunk: int = 256,
    w_chunk: int = 3,
) -> np.ndarray:
    """R3: the standalone ``position_reflow`` sort
    (position_reflow.py:8-21).

    Differs from the R2 fallback in one load-bearing way: the
    quantization scale comes from the PAGE IMAGE dims
    (``sf = (page_h // 256, page_w // 3)``, position_reflow.py:11),
    not from the blocks' extent fold.  Same int truncation, floor
    division, lexicographic key and stable tie order.  Shares the
    divisor-0 -> 1 crash-guard deviation (reference raises if
    page_h < 256)."""
    n = len(x1)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    sf_y = float(page_h) // h_chunk or 1.0
    sf_x = float(page_w) // w_chunk or 1.0
    ix1 = np.asarray(x1, dtype=np.float64).astype(np.int64)
    iy1 = np.asarray(y1, dtype=np.float64).astype(np.int64)
    ix2 = np.asarray(x2, dtype=np.float64).astype(np.int64)
    iy2 = np.asarray(y2, dtype=np.float64).astype(np.int64)
    qx, qy = ix1 // sf_x, iy1 // sf_y
    qx2, qy2 = ix2 // sf_x, iy2 // sf_y
    return np.lexsort((qy2, qx2, qy, qx)).astype(np.int64)


def _grid_sort_list(X1, Y1, X2, Y2, idx: list) -> list:
    """List-based grid sort (same semantics as grid_sort_indices);
    page-sized subsets are faster in plain Python than NumPy."""
    if not idx:
        return idx
    min_x, min_y, max_x, max_y = X1[0], Y1[0], X2[0], Y2[0]
    for i in idx:
        if X1[i] < min_x:
            min_x = X1[i]
        if X2[i] > max_x:
            max_x = X2[i]
        if Y1[i] < min_y:
            min_y = Y1[i]
        if Y2[i] > max_y:
            max_y = Y2[i]
    sf_y = (max_y - min_y) // 16 or 1.0
    sf_x = (max_x - min_x) // 3 or 1.0
    keyed = sorted(
        (
            (int(X1[i]) // sf_x, int(Y1[i]) // sf_y,
             int(X2[i]) // sf_x, int(Y2[i]) // sf_y),
            k,
        )
        for k, i in enumerate(idx)
    )
    return [idx[k] for _, k in keyed]


def xy_cut_order(
    x1,
    y1,
    x2,
    y2,
    margin: float = 10.0,
    horizontal_first: bool = True,
    max_depth: int = 8,
) -> np.ndarray:
    """Return the reading-order permutation of blocks 0..n-1.

    Equivalent to ``xy_cut_reflow(layout, margin, horizontal_first)``
    (xy_cut_reflow.py:189-202) with max_depth=8.

    Implementation note: per-page block counts are tens, so the inner
    partition loops run on plain Python lists — NumPy's per-op overhead
    dominates at this size (measured ~2x whole-kernel difference).
    """
    n = len(x1)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    X1 = [float(v) for v in x1]
    Y1 = [float(v) for v in y1]
    X2 = [float(v) for v in x2]
    Y2 = [float(v) for v in y2]

    out: list[int] = []
    first_axis = HORIZONTAL if horizontal_first else VERTICAL
    # LIFO stack of (subset_indices, axis, margin, depth); children are
    # pushed in reverse so they pop in reading order.
    stack = [(list(range(n)), first_axis, float(margin), 0)]
    while stack:
        idx, axis, m, depth = stack.pop()
        if len(idx) <= 1:
            out.extend(idx)
            continue
        if depth > max_depth:
            out.extend(_grid_sort_list(X1, Y1, X2, Y2, idx))
            continue

        lo_all = X1 if axis == HORIZONTAL else Y1
        hi_all = X2 if axis == HORIZONTAL else Y2
        # candidate cuts from every box of this region, in value order
        cands = sorted(
            v for i in idx for v in (lo_all[i] - m, hi_all[i] + m)
        )
        child_m = m - depth * (m / max_depth)
        next_axis = VERTICAL if axis == HORIZONTAL else HORIZONTAL

        # Equivalent O(k log k) form of the reference's rescan loop
        # (semantics proof: near(cut) = {hi <= cut} since lo <= hi;
        # far(cut) = {lo >= cut}; straddle iff some box has
        # lo < cut < hi strictly; a duplicate/empty-near candidate is
        # skipped with state unchanged).  Boxes sorted by hi give the
        # consumed prefix per valid cut; a suffix-min of lo over that
        # order answers the straddle test in O(log k) per candidate.
        by_hi = sorted(idx, key=lambda i: hi_all[i])
        his = [hi_all[i] for i in by_hi]
        kk = len(by_hi)
        suffix_min_lo = [0.0] * (kk + 1)
        suffix_min_lo[kk] = float("inf")
        for p in range(kk - 1, -1, -1):
            lo_p = lo_all[by_hi[p]]
            nxt = suffix_min_lo[p + 1]
            suffix_min_lo[p] = lo_p if lo_p < nxt else nxt
        valid_cuts: list[float] = []
        consumed = 0
        for cut in cands:
            pos = bisect_right(his, cut)
            if pos <= consumed:  # near side empty
                continue
            if suffix_min_lo[pos] < cut:  # straddler exists
                continue
            valid_cuts.append(cut)
            consumed = pos
        if valid_cuts:
            nseg = len(valid_cuts) + 1
            segments: list[list[int]] = [[] for _ in range(nseg)]
            for i in idx:  # original order preserved within segments
                segments[bisect_left(valid_cuts, hi_all[i])].append(i)
            if not segments[-1]:
                segments.pop()
        else:
            segments = [idx]

        for seg in reversed(segments):
            stack.append((seg, next_axis, child_m, depth + 1))

    return np.asarray(out, dtype=np.int64)
