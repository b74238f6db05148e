"""Classifier quirk tests (reference block.py:29-68, SURVEY.md §1.3)."""

import numpy as np

from latyas_spark.core import blocktypes as bt


def test_ordered_substring_quirks():
    # "text" wins first: the TextWithEquation branch is unreachable
    assert bt.kind_from_label("textwithequation") == bt.TEXT
    assert bt.kind_from_label("TextWithEquation") == bt.TEXT
    # caption+figure/table win over bare figure/table
    assert bt.kind_from_label("figure_caption") == bt.FIGURE_CAPTION
    assert bt.kind_from_label("caption of table") == bt.TABLE_CAPTION
    assert bt.kind_from_label("caption") == bt.CAPTION
    # embedeq is tested before equation
    assert bt.kind_from_label("embedeq_equation") == bt.EMBED_EQ
    assert bt.kind_from_label("isolated equation") == bt.EQUATION
    # case-insensitive; unknown fallback
    assert bt.kind_from_label("TOC") == bt.TOC
    assert bt.kind_from_label("mystery") == bt.UNKNOWN


def test_title_beats_figure():
    # ordered: title checked before figure
    assert bt.kind_from_label("figure_title") == bt.TITLE


def test_predicate_groups():
    assert bt.is_text_kind(bt.HEADER)
    assert bt.is_text_kind(bt.REFERENCE)
    assert not bt.is_text_kind(bt.TABLE)
    assert bt.is_image_kind(bt.QRCODE)
    assert bt.is_equation_kind(bt.EMBED_EQ)
    codes = np.array([bt.TEXT, bt.FIGURE, bt.EQUATION, bt.FOOTER])
    assert bt.text_kind_mask(codes).tolist() == [True, False, False, True]
    assert bt.image_kind_mask(codes).tolist() == [False, True, False, False]


def test_vectorized_matches_scalar():
    from latyas_spark.fixtures import LABELS_BY_KIND

    labels = [v for vs in LABELS_BY_KIND.values() for v in vs]
    vec = bt.kinds_from_labels(labels)
    assert vec.tolist() == [bt.kind_from_label(s) for s in labels]
