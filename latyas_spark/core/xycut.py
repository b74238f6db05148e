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


def xy_cut_order(
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    margin: float = 10.0,
    horizontal_first: bool = True,
    max_depth: int = 8,
) -> np.ndarray:
    """Return the reading-order permutation of blocks 0..n-1.

    Equivalent to ``xy_cut_reflow(layout, margin, horizontal_first)``
    (xy_cut_reflow.py:189-202) with max_depth=8.
    """
    n = len(x1)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)

    out: list[np.ndarray] = []
    first_axis = HORIZONTAL if horizontal_first else VERTICAL
    # LIFO stack of (subset_indices, axis, margin, depth); children are
    # pushed in reverse so they pop in reading order.
    stack: list[tuple[np.ndarray, int, float, int]] = [
        (np.arange(n, dtype=np.int64), first_axis, float(margin), 0)
    ]
    while stack:
        idx, axis, m, depth = stack.pop()
        if len(idx) <= 1:
            out.append(idx)
            continue
        if depth > max_depth:
            out.append(grid_sort_indices(x1, y1, x2, y2, idx))
            continue

        lo_all = x1 if axis == HORIZONTAL else y1
        hi_all = x2 if axis == HORIZONTAL else y2
        # candidate cuts from every box of this region, in value order
        cands = np.sort(np.concatenate([lo_all[idx] - m, hi_all[idx] + m]))
        child_m = m - depth * (m / max_depth)
        next_axis = VERTICAL if axis == HORIZONTAL else HORIZONTAL

        segments: list[np.ndarray] = []
        rest = idx
        for cut in cands:
            lo = lo_all[rest]
            hi = hi_all[rest]
            near = (lo <= cut) & (hi <= cut)
            far = (lo >= cut) & (hi >= cut) & ~near  # first branch wins
            if not (~(near | far)).any():  # nothing straddles
                left = rest[near]
                if len(left) == 0:
                    continue
                segments.append(left)
                rest = rest[far]
        segments.append(rest)

        for seg in reversed(segments):
            stack.append((seg, next_axis, child_m, depth + 1))

    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)
