"""Pipeline presets: the reference's per-mode pipeline constructors as
config objects.

The reference binds, per mode, a set of layout detectors, OCR models
and a kind->model rule table in the pipeline constructor:

  * paper  — 2 detectors (360LayoutAnalysis-paper + TexTeller RT-DETR)
             and 12 rules covering every extractable kind
             (paper_pipeline.py:18-59);
  * report — 1 detector, paddle OCR, rules for Title/Text/Caption only
             (report_pipeline.py:13-24);
  * book   — identical shape to report (book_pipeline.py:12-23).

In the span engine the models are deterministic stand-ins, so a preset
reduces to: how many detector sidecars the flagship unions (U1), which
kinds are ruled (the J4 dispatch table — a kind without a rule makes
the reference raise mid-page; we leave the block textless and surface
it as 'unrouted' in ocr_route), and the ExtractConfig the kernels run
with.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

from ..core import blocktypes as bt
from ..core.document import ExtractConfig

# kind-name -> model-name tables, verbatim from the pipeline ctors
PAPER_RULES: Tuple[Tuple[str, str], ...] = (
    ("title", "ocr_paddle"), ("text", "ocr_paddle"),
    ("caption", "ocr_paddle"), ("tablecaption", "ocr_paddle"),
    ("figurecaption", "ocr_paddle"), ("reference", "ocr_paddle"),
    ("header", "ocr_paddle"), ("footer", "ocr_paddle"),
    ("equation", "ocr_texteller"), ("embedeq", "ocr_texteller"),
    ("textwithequation", "ocr_texmix"), ("table", "tsr_gotocr2"),
)  # paper_pipeline.py:47-59

REPORT_RULES: Tuple[Tuple[str, str], ...] = (
    ("title", "ocr_paddle"), ("text", "ocr_paddle"),
    ("caption", "ocr_paddle"),
)  # report_pipeline.py:22-24

BOOK_RULES: Tuple[Tuple[str, str], ...] = (
    ("title", "ocr_paddle"), ("text", "ocr_paddle"),
    ("caption", "ocr_paddle"),
)  # book_pipeline.py:21-23


def _ruled_kind_codes(rules: Tuple[Tuple[str, str], ...]) -> frozenset:
    return frozenset(bt.KIND_CODES[k] for k, _ in rules)


@dataclass(frozen=True)
class Preset:
    name: str
    n_detectors: int
    ocr_rules: Tuple[Tuple[str, str], ...]
    config: ExtractConfig


def _mk(name: str, n_detectors: int, rules, **cfg_kw) -> Preset:
    return Preset(
        name=name,
        n_detectors=n_detectors,
        ocr_rules=rules,
        config=ExtractConfig(ruled_kinds=_ruled_kind_codes(rules), **cfg_kw),
    )


# paper runs TWO detectors (paper_pipeline.py:21-33): general layout +
# the latex detector; their outputs union (U1) then J1-merge.
PAPER = _mk("paper", 2, PAPER_RULES)
REPORT = _mk("report", 1, REPORT_RULES)
BOOK = _mk("book", 1, BOOK_RULES)

PRESETS: Dict[str, Preset] = {p.name: p for p in (PAPER, REPORT, BOOK)}


def get_preset(name: str) -> Preset:
    try:
        return PRESETS[name]
    except KeyError:
        raise ValueError(
            f"unknown pipeline preset {name!r}; choose from {sorted(PRESETS)}"
        ) from None
