"""Block-kind vocabulary and the raw-label classifier.

Reproduces the semantics of the reference's ``BlockType`` enum and its
``from_str`` parser (reference: latyas/layout/block.py:8-68) without
copying its structure: kinds are plain int codes here, and the parser is
a data-driven ordered substring table rather than an if/elif chain.

Two behavioral quirks of the reference are preserved deliberately
(SURVEY.md §1.3) — goldens depend on them:

* matching is *ordered substring* matching on the lowercased label, so
  the label ``"textwithequation"`` matches ``"text"`` first and parses
  to TEXT — the TEXTWITHEQUATION branch is unreachable from labels;
* ``"caption"`` combined with ``"figure"``/``"table"`` wins over plain
  ``"figure"``/``"table"``; ``"embedeq"`` is tested before
  ``"equation"``.
"""

from __future__ import annotations

import numpy as np

# Int codes equal the reference enum values (block.py:8-27); the merge
# strategy keeps the larger code (layout.py:120-123), so the numeric
# order is load-bearing.
UNKNOWN = 0
TEXT = 1
TITLE = 2
CAPTION = 3
FIGURE = 4
FIGURE_CAPTION = 5
TABLE = 6
TABLE_CAPTION = 7
HEADER = 8
FOOTER = 9
REFERENCE = 10
EQUATION = 11
EMBED_EQ = 12
TOC = 13
LIST = 14
ICON = 15
QRCODE = 16
BARCODE = 17
TEXT_WITH_EQUATION = 18

KIND_NAMES = {
    UNKNOWN: "unknown",
    TEXT: "text",
    TITLE: "title",
    CAPTION: "caption",
    FIGURE: "figure",
    FIGURE_CAPTION: "figurecaption",
    TABLE: "table",
    TABLE_CAPTION: "tablecaption",
    HEADER: "header",
    FOOTER: "footer",
    REFERENCE: "reference",
    EQUATION: "equation",
    EMBED_EQ: "embedeq",
    TOC: "toc",
    LIST: "list",
    ICON: "icon",
    QRCODE: "qrcode",
    BARCODE: "barcode",
    TEXT_WITH_EQUATION: "textwithequation",
}

KIND_CODES = {name: code for code, name in KIND_NAMES.items()}

# Ordered matcher table: first row whose needle(s) are all substrings of
# the lowercased label wins.  Row order mirrors block.py:31-66 exactly.
_MATCH_TABLE: list[tuple[tuple[str, ...], int]] = [
    (("text",), TEXT),
    (("title",), TITLE),
    (("caption", "figure"), FIGURE_CAPTION),
    (("caption", "table"), TABLE_CAPTION),
    (("caption",), CAPTION),
    (("figure",), FIGURE),
    (("table",), TABLE),
    (("header",), HEADER),
    (("footer",), FOOTER),
    (("reference",), REFERENCE),
    (("embedeq",), EMBED_EQ),
    (("equation",), EQUATION),
    (("toc",), TOC),
    (("list",), LIST),
    (("icon",), ICON),
    (("qrcode",), QRCODE),
    (("barcode",), BARCODE),
    (("textwithequation",), TEXT_WITH_EQUATION),
]


_KIND_CACHE: dict = {}


def kind_from_label(label: str) -> int:
    """Ordered-substring label parse (block.py:29-68 semantics).

    Memoized: real corpora draw labels from a small model vocabulary,
    so the substring chain runs once per distinct label per worker."""
    cached = _KIND_CACHE.get(label)
    if cached is not None:
        return cached
    low = label.lower()
    code = UNKNOWN
    for needles, c in _MATCH_TABLE:
        if all(n in low for n in needles):
            code = c
            break
    if len(_KIND_CACHE) < 65536:
        _KIND_CACHE[label] = code
    return code


def kinds_from_labels(labels) -> np.ndarray:
    """Vectorized wrapper for a sequence/array of raw labels."""
    return np.fromiter(
        (kind_from_label(s) for s in labels), dtype=np.int64, count=len(labels)
    )


# Predicate groups (block.py:95-121).
TEXT_KINDS = frozenset(
    {TEXT, CAPTION, FIGURE_CAPTION, TABLE_CAPTION, TITLE, REFERENCE, HEADER, FOOTER}
)
IMAGE_KINDS = frozenset({FIGURE, ICON, QRCODE, BARCODE})
EQUATION_KINDS = frozenset({EQUATION, EMBED_EQ})

_TEXT_KIND_ARR = np.zeros(19, dtype=bool)
for _k in TEXT_KINDS:
    _TEXT_KIND_ARR[_k] = True
_IMAGE_KIND_ARR = np.zeros(19, dtype=bool)
for _k in IMAGE_KINDS:
    _IMAGE_KIND_ARR[_k] = True


# public alias: bool lookup table indexed by kind code
TEXT_KIND_LOOKUP = _TEXT_KIND_ARR


def is_text_kind(code: int) -> bool:
    return code in TEXT_KINDS


def is_image_kind(code: int) -> bool:
    return code in IMAGE_KINDS


def is_equation_kind(code: int) -> bool:
    return code in EQUATION_KINDS


def text_kind_mask(codes: np.ndarray) -> np.ndarray:
    """Boolean mask of text-group kinds for an int-code array."""
    return _TEXT_KIND_ARR[codes]


def image_kind_mask(codes: np.ndarray) -> np.ndarray:
    return _IMAGE_KIND_ARR[codes]
