"""Vectorized rectangle geometry on coordinate arrays.

Struct-of-arrays equivalents of the reference's ``Rectangle`` methods
(latyas/layout/shape.py:70-190).  One quirk is preserved exactly because
downstream overlap tests depend on it: the constructor *clamps*
``x2 <- x1`` when ``x1 >= x2`` (and likewise for y), so a disjoint
intersection degenerates to a zero-area rectangle instead of going
negative (shape.py:74-77, 140-149).

All functions take/return float64 NumPy arrays; rectangles are four
parallel arrays (x1, y1, x2, y2).
"""

from __future__ import annotations

import numpy as np


def clamp_rect(x1, y1, x2, y2):
    """Apply the reference constructor clamp (shape.py:74-77)."""
    x2c = np.where(x1 >= x2, x1, x2)
    y2c = np.where(y1 >= y2, y1, y2)
    return x1, y1, x2c, y2c


def area(x1, y1, x2, y2):
    return (x2 - x1) * (y2 - y1)


def intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Pairwise intersection with degenerate clamp (shape.py:140-149)."""
    ix1 = np.maximum(ax1, bx1)
    iy1 = np.maximum(ay1, by1)
    ix2 = np.minimum(ax2, bx2)
    iy2 = np.minimum(ay2, by2)
    return clamp_rect(ix1, iy1, ix2, iy2)


def intersect_area(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    ix1, iy1, ix2, iy2 = intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    return area(ix1, iy1, ix2, iy2)


def union(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Bounding-box union (shape.py:129-138)."""
    return (
        np.minimum(ax1, bx1),
        np.minimum(ay1, by1),
        np.maximum(ax2, bx2),
        np.maximum(ay2, by2),
    )


def is_inside(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2, margin: float = 20.0):
    """True where rect a lies inside rect b expanded by margin
    (shape.py:121-127; default margin 20 is the reference default)."""
    return (
        (ax1 >= bx1 - margin)
        & (ay1 >= by1 - margin)
        & (ax2 <= bx2 + margin)
        & (ay2 <= by2 + margin)
    )


def pairwise_intersect_area(x1, y1, x2, y2):
    """Full n*n matrix of pairwise intersection areas (with clamp)."""
    ix1 = np.maximum(x1[:, None], x1[None, :])
    iy1 = np.maximum(y1[:, None], y1[None, :])
    ix2 = np.minimum(x2[:, None], x2[None, :])
    iy2 = np.minimum(y2[:, None], y2[None, :])
    w = ix2 - ix1
    h = iy2 - iy1
    # clamp semantics: a degenerate edge contributes zero, never negative
    return np.where(w > 0, w, 0.0) * np.where(h > 0, h, 0.0)


def shrink(x1, y1, x2, y2, factor: float):
    """Shrink about the center (shape.py:172-184)."""
    cx = (x1 + x2) / 2.0
    cy = (y1 + y2) / 2.0
    hw = (x2 - x1) * factor / 2.0
    hh = (y2 - y1) * factor / 2.0
    return cx - hw, cy - hh, cx + hw, cy + hh
