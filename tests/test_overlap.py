"""Overlap merge sweep tests (reference layout.py:86-132)."""

import numpy as np

from latyas_spark.core import blocktypes as bt
from latyas_spark.core.overlap import overlap_merge


def run(boxes, kinds, strategy="merge", thr=0.5):
    a = np.asarray(boxes, dtype=float)
    return overlap_merge(
        a[:, 0], a[:, 1], a[:, 2], a[:, 3],
        np.asarray(kinds), bt.TEXT_KIND_LOOKUP,
        area_threshold=thr, strategy=strategy,
    )


def test_merge_keeps_max_kind_and_union_bbox():
    # title (2) over text (1), heavy overlap: i removed, j keeps
    # max-code kind and the union bbox
    keep, x1, y1, x2, y2, k = run(
        [(0, 0, 100, 100), (10, 10, 120, 110)], [bt.TITLE, bt.TEXT]
    )
    assert keep.tolist() == [1]
    assert k.tolist() == [bt.TITLE]
    assert (x1[0], y1[0], x2[0], y2[0]) == (0, 0, 120, 110)


def test_different_nontext_kinds_never_merge():
    keep, *_ = run([(0, 0, 100, 100), (0, 0, 100, 100)], [bt.FIGURE, bt.TABLE])
    assert keep.tolist() == [0, 1]


def test_both_text_group_kinds_merge_across_kinds():
    keep, _, _, _, _, k = run(
        [(0, 0, 100, 100), (5, 5, 100, 100)], [bt.HEADER, bt.CAPTION]
    )
    assert keep.tolist() == [1]
    assert k.tolist() == [bt.HEADER]  # 8 > 3


def test_threshold_uses_either_side():
    # small box fully inside a big one: inter = small area -> trigger
    # even though inter is tiny vs the big one
    keep, *_ = run([(0, 0, 1000, 1000), (10, 10, 20, 20)], [bt.TEXT, bt.TEXT])
    assert keep.tolist() == [1]


def test_no_merge_below_threshold():
    keep, *_ = run([(0, 0, 100, 100), (90, 90, 190, 190)], [bt.TEXT, bt.TEXT])
    assert keep.tolist() == [0, 1]


def test_chain_merge_same_i_keeps_sweeping():
    # i=0 overlaps j=1 and j=2: after merging into 1, the inner sweep
    # continues and merges 0 into 2 as well (reference quirk: the
    # removed check happens only at outer-loop entry)
    keep, x1, y1, x2, y2, k = run(
        [(0, 0, 100, 100), (0, 0, 100, 100), (0, 0, 100, 100)],
        [bt.TEXT, bt.TEXT, bt.TEXT],
    )
    # 0 merges into 1 (0 removed); inner loop continues: 0 vs 2 merges
    # (0 already removed); then i=1: 1 vs 2 merges (1 removed)
    assert keep.tolist() == [2]


def test_keep_large_and_keep_small():
    boxes = [(0, 0, 100, 100), (0, 0, 50, 100)]  # area 10000 vs 5000
    keep, *_ = run(boxes, [bt.TEXT, bt.TEXT], strategy="keep_large")
    assert keep.tolist() == [0]
    keep, *_ = run(boxes, [bt.TEXT, bt.TEXT], strategy="keep_small")
    assert keep.tolist() == [1]


def test_keep_large_tie_removes_i():
    boxes = [(0, 0, 100, 100), (0, 0, 100, 100)]
    keep, *_ = run(boxes, [bt.TEXT, bt.TEXT], strategy="keep_large")
    assert keep.tolist() == [1]  # tie: area_i > area_j is False -> remove i


def test_degenerate_intersection_is_zero_area():
    # touching edges: clamp makes the intersection zero-area, no merge
    keep, *_ = run([(0, 0, 100, 100), (100, 0, 200, 100)], [bt.TEXT, bt.TEXT])
    assert keep.tolist() == [0, 1]
