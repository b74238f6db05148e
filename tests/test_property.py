"""Property-based parity: kernels vs the independent oracle port on
RANDOM geometry (hypothesis), not just the seeded fixture corpus
(SURVEY.md §5.3).  Catches quirk divergence the fixtures never reach:
degenerate rects, identical coordinates, all-filtered pages, label
case soup, straddling boxes that defeat every xy-cut."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from latyas_spark.core.document import extract_document_rows
from latyas_spark.core.xycut import xy_cut_order
from latyas_spark.oracle.ref_port import extract_document_oracle

LABELS = [
    "text", "Text", "TITLE", "figure", "figure_caption", "table_caption",
    "table", "header", "footer", "reference", "equation", "embedeq",
    "icon", "qrcode", "toc", "list", "unknownlabel", "textwithequation",
]

coord = st.integers(min_value=0, max_value=900)
dim = st.integers(min_value=0, max_value=300)


@st.composite
def span_row(draw, offset):
    x1 = draw(coord)
    y1 = draw(coord)
    has_text = draw(st.booleans())
    label = draw(st.sampled_from(LABELS))
    return {
        "doc_id": "prop-doc",
        "offset": offset,
        "page": draw(st.integers(min_value=0, max_value=2)),
        "x1": float(x1),
        "y1": float(y1),
        "x2": float(x1 + draw(dim)),
        "y2": float(y1 + draw(dim)),
        "conf": draw(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False)
        ),
        "label": label,
        "text": (
            draw(st.text(alphabet="ab c\nd(3)", max_size=12))
            if has_text
            else None
        ),
        "media_ref": f"media://{offset}" if not has_text else None,
    }


@st.composite
def doc_rows(draw):
    n = draw(st.integers(min_value=0, max_value=24))
    return [draw(span_row(i)) for i in range(n)]


@settings(max_examples=150, deadline=None)
@given(doc_rows())
def test_kernel_equals_oracle_on_random_geometry(rows):
    got = extract_document_rows(rows)
    want = extract_document_oracle(rows)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(doc_rows())
def test_emitted_spans_sourced_from_input(rows):
    """Nothing is invented: every emitted media_ref exists in the
    input; every emitted plain-text span is built from input text
    fragments (newlines stripped)."""
    spans = extract_document_rows(rows)
    in_media = {r["media_ref"] for r in rows if r["media_ref"]}
    for kind, text, media, _order in spans:
        if media is not None:
            assert media in in_media
    # dense doc-wide order
    assert [s[3] for s in spans] == list(range(len(spans)))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(coord, coord, dim, dim), min_size=0, max_size=20
    )
)
def test_xy_cut_is_permutation(boxes):
    n = len(boxes)
    x1 = np.array([b[0] for b in boxes], dtype=np.float64)
    y1 = np.array([b[1] for b in boxes], dtype=np.float64)
    x2 = x1 + np.array([b[2] for b in boxes], dtype=np.float64)
    y2 = y1 + np.array([b[3] for b in boxes], dtype=np.float64)
    order = xy_cut_order(x1, y1, x2, y2)
    assert sorted(order) == list(range(n))
